"""Explicit StructType schemas for every table the engine touches.

Reference-shaped tables mirror sec_dl/utils/init_tables.py:31-52 (SQLAlchemy
Table metadata → PostgreSQL DDL). CSV/idx ingestion always passes an explicit
schema — never ``inferSchema`` — for determinism (SURVEY.md §1.4).

Fixture tables mirror the driver parquet at /root/testdata (FIXTURES.md §B).
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- Reference-shaped tables (sec_dl/utils/init_tables.py:31-52) -----------

# companies: permno INT PK, ticker VARCHAR(10), cik INT NULL, business_name
# VARCHAR(100)  (init_tables.py:31-35; Spark has no length-parameterized
# string — lengths are enforced at the JDBC sink via createTableColumnTypes).
COMPANIES = T.StructType(
    [
        T.StructField("permno", T.IntegerType(), nullable=False),
        T.StructField("ticker", T.StringType(), nullable=False),
        T.StructField("cik", T.IntegerType(), nullable=True),
        T.StructField("business_name", T.StringType(), nullable=False),
    ]
)

# filing_types: type_id INT PK, type TEXT, keep INT (init_tables.py:37-40).
FILING_TYPES = T.StructType(
    [
        T.StructField("type_id", T.IntegerType(), nullable=False),
        T.StructField("type", T.StringType(), nullable=False),
        T.StructField("keep", T.IntegerType(), nullable=False),
    ]
)

# filings: the fact table (init_tables.py:42-50). The reference's TSVECTOR
# trigger column becomes a derived ARRAY<STRING> token column computed at
# write time (SURVEY.md §1.4); `year`/`qtr` partition columns mirror the
# EDGAR feed granularity (load_filings_idx.py:22-28) for partition pruning.
FILINGS = T.StructType(
    [
        T.StructField("filing_id", T.LongType(), nullable=False),
        T.StructField("cik", T.IntegerType(), nullable=False),
        T.StructField("business_name", T.StringType(), nullable=True),
        T.StructField("type", T.StringType(), nullable=True),
        T.StructField("path", T.StringType(), nullable=True),
        T.StructField("date", T.DateType(), nullable=True),
        T.StructField("text", T.StringType(), nullable=True),
        T.StructField("tokens", T.ArrayType(T.StringType()), nullable=True),
    ]
)

# Raw EDGAR master.idx record after the pipe-split parse, before filtering
# (load_filings_idx.py:40-42: columns renamed positionally).
IDX_RECORD = T.StructType(
    [
        T.StructField("cik", T.IntegerType(), nullable=True),
        T.StructField("business_name", T.StringType(), nullable=True),
        T.StructField("type", T.StringType(), nullable=True),
        T.StructField("date", T.DateType(), nullable=True),
        T.StructField("path", T.StringType(), nullable=True),
    ]
)

# Inverted-index posting table replacing the GIN index
# (init_tables.py:56-57): one row per (token, doc) with positions.
POSTINGS = T.StructType(
    [
        T.StructField("token", T.StringType(), nullable=False),
        T.StructField("doc_id", T.LongType(), nullable=False),
        T.StructField("positions", T.ArrayType(T.IntegerType()), nullable=False),
    ]
)

# Multimodal blob table: opaque binary payload + typed metadata
# (SURVEY.md §2.11 — binaryFile source maps to this shape).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("kind", T.StringType(), nullable=False),  # image|audio|video
        T.StructField("content", T.BinaryType(), nullable=True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
            nullable=True,
        ),
    ]
)

# --- Driver fixture tables (FIXTURES.md §B) --------------------------------

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
