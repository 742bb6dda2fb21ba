"""Live PostgreSQL round-trip — OPT-IN ONLY (this container has no PG or
psycopg2; the serving path is sqlite/mock-proven in test_sinks.py).

Run with SPARK_GRAFT_PG_DSN pointing at a scratch database on a machine
that has both, e.g.:

    SPARK_GRAFT_PG_DSN='dbname=scratch user=postgres host=localhost' \
        python -m pytest tests/test_live_pg.py -v

Skips cleanly otherwise — the mirror of tests/test_live_http.py's pattern
for the declared serving architecture (BASELINE.json: PG is the serving
mirror, Spark is the compute engine).
"""

import os

import pytest

DSN = os.environ.get("SPARK_GRAFT_PG_DSN")

pytestmark = pytest.mark.skipif(
    not DSN, reason="live PostgreSQL test; set SPARK_GRAFT_PG_DSN to run"
)


@pytest.fixture()
def pg():
    psycopg2 = pytest.importorskip("psycopg2")
    conn = psycopg2.connect(DSN)
    conn.autocommit = True
    cur = conn.cursor()
    cur.execute("DROP TABLE IF EXISTS filings")
    cur.execute(
        "CREATE TABLE filings (filing_id INT PRIMARY KEY, cik INT, text TEXT)"
    )
    yield conn
    cur.execute("DROP TABLE IF EXISTS filings")
    conn.close()


def test_pg_upsert_batch_fn_roundtrip(spark, pg):
    """Executor-side keyed upsert (K4) against a real PG: first write
    inserts, second write with changed text updates in place — the
    reference's UPDATE-by-filing_id semantics, scaled to foreachPartition."""
    from sec_dl_spark.sinks.jdbc import pg_upsert_batch_fn

    fn = pg_upsert_batch_fn(DSN, "filings", ["filing_id"])
    v1 = spark.createDataFrame(
        [(1, 100, "first text"), (2, 200, "second text")],
        "filing_id int, cik int, text string",
    )
    fn(v1, batch_id=0)
    v2 = spark.createDataFrame(
        [(2, 200, "second text AMENDED"), (3, 300, "third text")],
        "filing_id int, cik int, text string",
    )
    fn(v2, batch_id=1)

    with pg.cursor() as cur:
        cur.execute("SELECT filing_id, text FROM filings ORDER BY filing_id")
        rows = cur.fetchall()
    assert rows == [
        (1, "first text"),
        (2, "second text AMENDED"),
        (3, "third text"),
    ]


def test_pg_fts_ddl_enables_tsquery(spark, pg):
    """K7/K9 parity on a real PG: after apply_pg_fts_ddl the mirror answers
    `token @@ to_tsquery(...)` exactly like the reference's GIN + trigger
    schema (init_tables.py:56-67)."""
    from sec_dl_spark.sinks.jdbc import apply_pg_fts_ddl, pg_upsert_batch_fn

    fn = pg_upsert_batch_fn(DSN, "filings", ["filing_id"])
    docs = spark.createDataFrame(
        [
            (1, 100, "annual report of the registrant pursuant to section 13"),
            (2, 200, "quarterly report with material weakness disclosure"),
        ],
        "filing_id int, cik int, text string",
    )
    fn(docs, batch_id=0)
    apply_pg_fts_ddl(DSN)

    with pg.cursor() as cur:
        cur.execute(
            "SELECT filing_id FROM filings "
            "WHERE token @@ to_tsquery('english', 'annual & report')"
        )
        hits = [r[0] for r in cur.fetchall()]
        cur.execute(
            "SELECT indexname FROM pg_indexes WHERE tablename = 'filings'"
        )
        indexes = [r[0] for r in cur.fetchall()]
    assert hits == [1]
    assert "filings_token_gin" in indexes
