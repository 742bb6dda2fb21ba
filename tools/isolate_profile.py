"""Isolation profiler for headline queries (guide §1: measure first).

For each named query: split the bench's timed region (`spark_fn(...).collect()`)
into PLAN time (Python build + logical analysis, forced by an explicit
`df.schema` touch so the split holds even on lazy-analysis sessions, plus any
eager pins the query runs at build) and EXEC time (collect), across reps, and
optionally dump `.explain("formatted")` to a file.

Usage:
    python tools/isolate_profile.py [--sf DIR] [--reps N] [--plans-dir DIR] names...

Prints one line per query: median plan s, median exec s, median total s.
Runs queries back-to-back in one session (same as bench); NOT a substitute
for the bench artifact — a targeting tool.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans-dir", default=None, help="dump explain('formatted') per query here")
    ap.add_argument("--suffix", default="before", help="plan file suffix (before/after)")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from sec_dl_spark.plans.catalog import load_all
    from sec_dl_spark.session import get_spark

    from bench import warmup_suite

    spark = get_spark("isolate_profile")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    warmup_suite(spark, specs, args.sf)

    print(f"{'query':42s} {'plan_s':>8s} {'exec_s':>8s} {'total_s':>8s}")
    for name in args.names:
        plan_t, exec_t, tot_t = [], [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = specs[name].spark_fn(spark, args.sf)
            df.schema  # force analysis inside plan_s, session-mode-independent
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            plan_t.append(t1 - t0)
            exec_t.append(t2 - t1)
            tot_t.append(t2 - t0)
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            df = specs[name].spark_fn(spark, args.sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            with open(f"{args.plans_dir}/{name}_{args.suffix}.txt", "w") as f:
                f.write(buf.getvalue())
        print(
            f"{name:42s} {statistics.median(plan_t):8.3f} "
            f"{statistics.median(exec_t):8.3f} {statistics.median(tot_t):8.3f}"
        )

    spark.stop()


if __name__ == "__main__":
    main()
