"""Mirror of the driver's correctness gate, runnable locally.

Runs every registry query through Spark AND its DuckDB oracle on the same
parquet fixtures, then compares row count, column names/dtypes, and values
(rows sorted, floats compared with tolerance). Usage:

    python tools/compare_oracle.py [--sf /root/testdata/sf0.001] [--exact] [names...]

``--exact`` switches float comparison from tolerance to byte-exact repr
equality (sign of zero included), mirroring the driver's serialized value
hash. The tolerance default is useful while developing an operator; the
exact mode is the pre-round gate — round 6 shipped a ``-0.0`` vs ``+0.0``
driver hash mismatch (corpus_dsir_weights) that the tolerance mode was
blind to, so every pre-round sweep must run with ``--exact``.
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import duckdb
import pandas as pd

from sec_dl_spark.schemas import FIXTURE_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in FIXTURE_TABLES:
        path = f"{sf_dir}/{name}.parquet"
        # the driver fixtures are single files; Spark-written fixtures
        # (e.g. the synthesized .scale/sf1) are part-file directories
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    return con


def _canon_cell(x):
    """Canonical python form of one cell: numpy arrays / lists -> nested
    tuples, numpy scalars -> python scalars. DuckDB hands array columns back
    as numpy arrays and Spark as python lists; both must sort and compare
    identically."""
    import numpy as np

    if isinstance(x, np.ndarray):
        return tuple(_canon_cell(v) for v in x.tolist())
    if isinstance(x, (list, tuple)):
        return tuple(_canon_cell(v) for v in x)
    if isinstance(x, np.generic):
        return x.item()
    return x


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        # object columns (strings, arrays, structs) sort by canonical string
        # form — pandas can't sort unhashable array cells natively; numeric
        # columns keep their native sort so the tolerance mode still pairs
        # close-but-unequal floats correctly
        keys = pd.DataFrame(
            {
                c: (
                    df[c].map(lambda x: str(_canon_cell(x)))
                    if df[c].dtype.kind == "O"
                    else df[c]
                )
                for c in df.columns
            }
        )
        order = keys.sort_values(
            by=list(keys.columns), kind="mergesort", na_position="first"
        ).index
        df = df.loc[order]
    return df.reset_index(drop=True)


def _float_repr(x) -> str:
    """Canonical serialized form of one float cell: distinguishes -0.0 from
    +0.0 (repr keeps the sign bit) and collapses every NaN to 'nan' — the
    same distinctions the driver's value hash makes."""
    if x is None:
        return "<null>"
    fx = float(x)
    return "nan" if math.isnan(fx) else repr(fx)


def oracle_regime_block(spec, table_counts: dict[str, int]) -> str | None:
    """Reason the spec's SQL oracle must NOT be hash-compared on this
    fixture, or None if certification applies.

    A query whose Spark side auto-routes to an approximate candidate
    generator above a size threshold (cosine_topk_auto) declares the
    exact-SQL regime via ``oracle_exact_max`` ({table: max_rows}); a
    larger fixture would produce a misleading red row — the engine is
    not wrong, the oracle just does not apply (ADVICE r13). Callers
    downgrade such queries to a rows-only check with this reason."""
    if not spec.oracle_exact_max or spec.oracle is None:
        return None
    for table, bound in spec.oracle_exact_max.items():
        n = table_counts.get(table)
        if n is not None and n > bound:
            return (
                f"oracle certifies only the exact regime "
                f"({table} <= {bound} rows; fixture has {n}) — "
                "approximate candidate generation above it"
            )
    return None


def compare_frames(
    a: pd.DataFrame, b: pd.DataFrame, rtol: float = 1e-9, exact: bool = False
) -> list[str]:
    """a=spark, b=oracle. Returns list of mismatch descriptions.

    ``exact=True`` compares floats by serialized repr (sign-of-zero exact),
    mirroring the driver hash; default compares with rel/abs tolerance."""
    errs: list[str] = []
    if sorted(a.columns) != sorted(b.columns):
        return [f"columns differ: spark={sorted(a.columns)} oracle={sorted(b.columns)}"]
    if len(a) != len(b):
        return [f"row count differs: spark={len(a)} oracle={len(b)}"]
    a, b = normalize(a), normalize(b)
    for col in a.columns:
        av, bv = a[col], b[col]
        try:
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                ok = True
                bad_at = None
                for i, (x, y) in enumerate(zip(av.tolist(), bv.tolist())):
                    if exact:
                        if _float_repr(x) != _float_repr(y):
                            ok, bad_at = False, (i, x, y)
                            break
                        continue
                    xn = x is None or (isinstance(x, float) and math.isnan(x))
                    yn = y is None or (isinstance(y, float) and math.isnan(y))
                    if xn != yn or (not xn and not math.isclose(float(x), float(y), rel_tol=rtol, abs_tol=1e-9)):
                        ok, bad_at = False, (i, x, y)
                        break
                if not ok:
                    i, x, y = bad_at
                    errs.append(
                        f"column {col}: float values differ "
                        f"(row {i}: spark={x!r} oracle={y!r})"
                    )
            else:
                av = av.map(_canon_cell).astype(str)
                bv = bv.map(_canon_cell).astype(str)
                if not av.equals(bv):
                    n_diff = int((av != bv).sum())
                    errs.append(f"column {col}: {n_diff} values differ "
                                f"(spark head={av.head(3).tolist()} oracle head={bv.head(3).tolist()})")
        except Exception as exc:  # noqa: BLE001
            errs.append(f"column {col}: compare error {exc}")
    return errs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--jobs",
        type=int,
        default=4,
        help="concurrent query comparisons (threads share the SparkSession; "
        "the sweep is scheduling/JIT-latency-bound, not CPU-bound, so "
        "overlapping submissions cuts wall-clock ~linearly). 1 = serial.",
    )
    ap.add_argument(
        "--exact",
        action="store_true",
        help="byte-exact float comparison (sign-of-zero included), mirroring "
        "the driver's value hash; use for the pre-round gate",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import threading
    from concurrent.futures import ThreadPoolExecutor

    from sec_dl_spark.plans.catalog import load_all
    from sec_dl_spark.session import get_spark

    specs = load_all()
    names = args.names or sorted(specs)
    spark = get_spark("compare_oracle", shuffle_partitions=8)
    # one DuckDB connection per worker thread — a connection is not
    # thread-safe, and per-thread view registration is milliseconds
    tls = threading.local()

    # fixture sizes once, for the oracle-regime gate (oracle_exact_max)
    _gate_con = duck_connection(args.sf)
    table_counts = {
        t: _gate_con.sql(f"SELECT count(*) FROM {t}").fetchone()[0]
        for t in FIXTURE_TABLES
    }
    _gate_con.close()

    def run_one(name: str) -> tuple[str, str, bool]:
        spec = specs[name]
        try:
            sdf = spec.spark_fn(spark, args.sf).toPandas()
        except Exception as exc:  # noqa: BLE001
            return name, f"FAIL {name}: spark error: {exc}", True
        if spec.oracle is None:
            return name, f"SKIP {name}: rows-only ({len(sdf)} rows)", False
        block = oracle_regime_block(spec, table_counts)
        if block is not None:
            return name, f"SKIP {name}: {block} ({len(sdf)} rows)", False
        try:
            if not hasattr(tls, "con"):
                tls.con = duck_connection(args.sf)
            odf = tls.con.sql(spec.oracle).df()
        except Exception as exc:  # noqa: BLE001
            return name, f"FAIL {name}: oracle error: {exc}", True
        errs = compare_frames(sdf, odf, exact=args.exact)
        if errs:
            return name, f"FAIL {name}: " + "; ".join(errs), True
        return name, f"OK   {name} ({len(sdf)} rows)", False

    failed = []
    if args.jobs <= 1:
        results = [run_one(n) for n in names]
    else:
        with ThreadPoolExecutor(max_workers=args.jobs) as pool:
            results = list(pool.map(run_one, names))
    for _name, line, bad in results:
        print(line)
        if bad:
            failed.append(_name)
    print(f"\n{len(names) - len(failed)}/{len(names)} passed")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
