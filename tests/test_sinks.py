"""JDBC sink unit tests — SQL generation and config surface (no live PG in
this environment; the round-trip integration is gated on a reachable DSN)."""

from sec_dl_spark.sinks.jdbc import FILINGS_COLUMN_TYPES, PG_FTS_DDL, build_upsert_sql


def test_build_upsert_sql():
    sql = build_upsert_sql("filings", ["filing_id", "text", "date"], ["filing_id"])
    assert sql == (
        "INSERT INTO filings (filing_id, text, date) VALUES (%s, %s, %s) "
        "ON CONFLICT (filing_id) DO UPDATE SET text = EXCLUDED.text, date = EXCLUDED.date"
    )


def test_filings_column_types_match_reference_widths():
    # load_filings_idx.py:52-57 — String(200)/String(50)/String(512)
    assert "VARCHAR(200)" in FILINGS_COLUMN_TYPES
    assert "VARCHAR(50)" in FILINGS_COLUMN_TYPES
    assert "VARCHAR(512)" in FILINGS_COLUMN_TYPES


def test_pg_fts_ddl_shape():
    joined = " ".join(PG_FTS_DDL)
    assert "tsvector" in joined and "gin" in joined.lower()
