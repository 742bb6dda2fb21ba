"""PostgreSQL serving mirror over JDBC (BASELINE.json approach: "Spark +
JDBC write to PostgreSQL").

The reference computes IN postgres (triggers, GIN index); here PG is only a
serving layer: Spark computes, JDBC ships results, and the PG-side DDL
(tsvector column, GIN index) reproduces the reference's end-user full-text
experience (/root/reference/sec_dl/utils/init_tables.py:42-67, README.md:7).
Engine-native FTS stays in operators/fts.py.

Everything here degrades gracefully when no PG/driver is present: writers
raise a clear error, DDL helpers are pure string builders (unit-testable),
and the upsert path is an injectable foreachBatch function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Column-width parity with the reference's sink-time dtype declarations
# (load_filings_idx.py:52-57: String(200)/String(50)/String(512)).
FILINGS_COLUMN_TYPES = "business_name VARCHAR(200), type VARCHAR(50), path VARCHAR(512)"

# DDL shipped verbatim to PG so the serving mirror matches the reference's
# schema surface (init_tables.py:56-67): real tsvector + GIN, regenerated
# postgres-side from the text Spark delivers.
PG_FTS_DDL = [
    "ALTER TABLE filings ADD COLUMN IF NOT EXISTS token tsvector",
    "UPDATE filings SET token = to_tsvector('english', coalesce(text, ''))",
    "CREATE INDEX IF NOT EXISTS filings_token_gin ON filings USING gin(token)",
]


def write_jdbc_append(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str],
    batchsize: int = 10_000,
    column_types: str | None = None,
    num_partitions: int | None = None,
) -> None:
    """Chunked append — the reference's to_sql(chunksize=10000) (K1-K3).
    numPartitions caps concurrent connections (reference budget:
    max_connections=400, BASELINE.md)."""
    if num_partitions:
        df = df.coalesce(num_partitions)
    writer = df.write.mode("append").option("batchsize", batchsize)
    if column_types:
        writer = writer.option("createTableColumnTypes", column_types)
    writer.jdbc(url, table, properties=properties)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str],
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
) -> DataFrame:
    """JDBC scan with optional range-partitioned parallel read (S4/S5;
    Catalyst pushes projected columns and translatable filters into the
    generated query)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", lower_bound)
            .option("upperBound", upper_bound)
            .option("numPartitions", num_partitions)
        )
    return reader.load()


def build_upsert_sql(
    table: str, columns: list[str], key_cols: list[str], paramstyle: str = "format"
) -> str:
    """INSERT ... ON CONFLICT DO UPDATE statement for the keyed-update path
    (K4, scrape_all_filings.py:169-171). Pure string builder — unit-tested
    without a database. ``paramstyle``: 'format' (%s, psycopg2) or
    'qmark' (?, e.g. sqlite stand-ins in tests)."""
    collist = ", ".join(columns)
    ph = "%s" if paramstyle == "format" else "?"
    placeholders = ", ".join([ph] * len(columns))
    keys = ", ".join(key_cols)
    updates = ", ".join(f"{c} = EXCLUDED.{c}" for c in columns if c not in key_cols)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
        f"ON CONFLICT ({keys}) DO UPDATE SET {updates}"
    )


def pg_upsert_batch_fn(
    dsn: str,
    table: str,
    key_cols: list[str],
    page_size: int = 1000,
    connection_factory=None,
    paramstyle: str = "format",
):
    """foreachBatch function performing keyed upserts EXECUTOR-SIDE: each
    partition opens its own connection and streams its rows in pages —
    no driver collect(), so the serving path scales with the cluster, not
    the driver (r1's collect() was the 100×-scale driver bottleneck).

    ``connection_factory``: zero-arg picklable callable returning a DB-API
    connection, run on the executor. Defaults to psycopg2.connect(dsn)
    (import-gated: raises only when a partition actually runs without
    psycopg2). Commit is per-partition — micro-batch atomicity across
    partitions is the checkpoint/idempotent-upsert contract, same as the
    reference's chunked to_sql."""

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        import itertools

        columns = batch_df.columns
        sql = build_upsert_sql(table, columns, key_cols, paramstyle=paramstyle)

        def write_partition(rows) -> None:
            rows = iter(rows)
            first = list(itertools.islice(rows, 1))
            if not first:
                return  # empty partition: never open a connection
            if connection_factory is not None:
                conn = connection_factory()

                def run_page(cur, page):
                    cur.executemany(sql, page)

            else:
                import psycopg2
                from psycopg2.extras import execute_batch

                conn = psycopg2.connect(dsn)

                def run_page(cur, page):
                    execute_batch(cur, sql, page, page_size=page_size)

            try:
                cur = conn.cursor()
                it = itertools.chain(first, rows)
                while True:
                    page = [tuple(r) for r in itertools.islice(it, page_size)]
                    if not page:
                        break
                    run_page(cur, page)
                conn.commit()
                cur.close()
            finally:
                conn.close()

        batch_df.foreachPartition(write_partition)

    return fn


def apply_pg_fts_ddl(dsn: str) -> None:
    """Ship the tsvector/GIN DDL to the PG mirror (K7/K9 parity)."""
    import psycopg2

    with psycopg2.connect(dsn) as conn, conn.cursor() as cur:
        for stmt in PG_FTS_DDL:
            cur.execute(stmt)
