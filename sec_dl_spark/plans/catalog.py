"""Query catalog: the driver-facing registry behind __spark_entry__.py.

Each entry pairs a Spark DataFrame program with (where SQL-expressible) an
ANSI-SQL oracle string that DuckDB runs over the same parquet fixtures
(TESTDATA.md). The driver compares row-count + schema + order-insensitive
value hash, sorting columns by name — so BOTH sides alias every computed
column identically, cast ambiguous integer widths to BIGINT, and round
floating aggregates to a fixed precision (SURVEY.md §5.1).

Queries marked ``oracle=None`` are non-SQL-expressible (approximate
algorithms, streaming state, side effects) and get the driver's weaker
rows-only check; pytest covers their semantics instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from sec_dl_spark.sources.fixtures import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame callable under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, (fn.__doc__ or "").strip())
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# The driver's correctness sweep truncates to the FIRST 50 registered names,
# so registration order is rotated each round to aim driver evidence at the
# stalest queries.  Round 1 proved the first-50 relational slice; round 2
# front-loaded text/FTS/dedup (CORRECTNESS_r02 greened exactly those).  Round
# 3 front-loads the complement: the 9 queries that had NEVER been
# driver-checked, multimodal_features (r2's one harness-crashed row, now
# returning scalar columns), and the 40 queries whose only driver evidence is
# r1-era — together exactly 50, so after r3 every registered query has driver
# evidence from some round.  Queries NOT listed here keep their module
# registration order after the priority block (r2-proven names, then any new
# this round — those rotate to the front in r4).
_PRIORITY = (
    # never driver-checked in any round (VERDICT r2 TL;DR list)
    "events_sliding_window",
    "events_zscore_pandas",
    "agg_udaf_geomean",
    "events_unpivot",
    "events_funnel",
    "events_asof_tolerance",
    "events_retention_cohort",
    "scalar_map_fns",
    "events_gap_filled",
    # r2 harness-crash row, re-checked after the scalar-projection fix
    "multimodal_features",
    # driver evidence only from round 1 (CORRECTNESS_r01 minus r02 overlap)
    "join_semi",
    "join_anti",
    "join_cross_urls",
    "join_q3_topk",
    "join_q5_region_revenue",
    "join_range",
    "sort_multi_key_limit",
    "topk_per_group",
    "set_ops",
    "union_by_name",
    "distinct_rows",
    "filter_isin",
    "window_running_sum",
    "window_lag_lead",
    "window_rank",
    "scalar_string_fns",
    "scalar_date_fns",
    "scalar_math_case",
    "scalar_json",
    "null_handling",
    "sample_systematic",
    "sample_bernoulli_seeded",
    "agg_percentiles",
    "agg_collect_list",
    "join_skew_salted",
    "agg_salted_distinct",
    "window_range_frame",
    "agg_minmax_by",
    "sql_adhoc_q6",
    "scalar_encode_decode",
    "agg_approx_distinct_hll",
    "join_null_safe",
    "subquery_exists",
    "window_distribution_fns",
    "entity_match_levenshtein",
    "events_tumbling_hourly",
    "events_sessionize",
    "events_asof_join",
    "events_dedup_first",
    "events_pivot",
)


def load_all() -> dict[str, QuerySpec]:
    """Import every plan module (registration side effect), then rebuild the
    registry so ``_PRIORITY`` names come first (driver-truncation rotation —
    see the comment above)."""
    from sec_dl_spark.plans import relational, streaming_batch, text  # noqa: F401

    ordered = {n: REGISTRY[n] for n in _PRIORITY if n in REGISTRY}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    return REGISTRY
