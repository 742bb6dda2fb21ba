"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <scale factor>}

Headline set: one representative per operator family whose cost scales with
the data (scan+agg, multi-way join, range join, window, rollup, event
sessionization + as-of, FTS index build+search, dedup fingerprint + blocked
jaccard, vector top-k, text stats). Each timing covers logical plan →
execution → collect of the (small) result.
"""

from __future__ import annotations

import json
import os
import re
import time

HEADLINE = [
    "q1_pricing_summary",
    "join_q3_topk",
    "join_q5_region_revenue",
    "join_range",
    "agg_rollup",
    "agg_distinct",
    "window_running_sum",
    "topk_per_group",
    "agg_percentiles",
    "events_tumbling_hourly",
    "events_sliding_window",
    "events_sessionize",
    "events_asof_join",
    "fts_search_and",
    "fts_top_df_tokens",
    "text_token_stats",
    "doc_chunks",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "emb_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    from sec_dl_spark.plans.catalog import load_all
    from sec_dl_spark.session import get_spark

    spark = get_spark("sec_dl_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()

    # JVM/codegen warmup outside the timed region: generic codegen, then
    # the text/FTS path (posexplode + collect_list + broadcast semi-join)
    # on the tiny sf — its first execution pays several seconds of JIT
    # that would otherwise land on whichever headline query runs it first.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs["fts_search_and"].spark_fn(spark, "/root/testdata/sf0.001").collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        specs[name].spark_fn(spark, sf_dir).collect()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query suite wall-clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
