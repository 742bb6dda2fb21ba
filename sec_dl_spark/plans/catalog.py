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
    # Regime bound for the SQL oracle: {table: max_rows}. Queries whose
    # Spark side AUTO-ROUTES to an approximate generator above a size
    # threshold (cosine_topk_auto) are byte-equal to their exact SQL
    # ONLY while the fixture stays below it; the certification harness
    # (tools/compare_oracle.py) refuses to hash-compare past the bound
    # instead of recording a misleading red row (ADVICE r13).
    oracle_exact_max: dict[str, int] | None = None


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    oracle_exact_max: dict[str, int] | None = None,
):
    """Register a (spark, sf_dir) -> DataFrame callable under ``name``.

    Duplicate names raise: the registry dict is last-wins, so a colliding
    registration in a later-imported module would silently SHADOW the
    original (different query, same driver row — this bit a new
    events_anomaly_mad in round 8, caught only by the original's pytest).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        prev = REGISTRY.get(name)
        # Re-registration of the SAME function object — or of a fresh
        # object that is a true reload/re-import duplicate (importlib.
        # reload, or a second import of the plans module under a
        # different sys.path spelling) — is idempotent, not shadowing
        # (ADVICE r8). (module, qualname) alone is NOT enough to prove a
        # reload: two DISTINCT factory-generated functions share the
        # same '<locals>.q' qualname in one module, so r8's carve-out
        # silently re-enabled the shadowing it was added to refuse
        # (ADVICE r9). Require the same def site (co_filename,
        # co_firstlineno) AND — for factory-made functions, which also
        # share a def site — the same scalar closure/default
        # fingerprint (a reload recreates equal cell VALUES; two
        # factory calls differ in the name/SQL strings they close
        # over). Only then is the collision accepted as idempotent.
        if prev is not None and prev.spark_fn is not fn:
            if not (
                (prev.spark_fn.__module__, prev.spark_fn.__qualname__)
                == (fn.__module__, fn.__qualname__)
                and _def_site(prev.spark_fn) == _def_site(fn)
                and _scalar_fingerprint(prev.spark_fn) == _scalar_fingerprint(fn)
            ):
                raise ValueError(
                    f"catalog query {name!r} already registered by "
                    f"{prev.spark_fn.__module__}; pick a distinct name "
                    "(the registry would silently shadow the original)"
                )
        # Idempotent re-registration keeps prev's oracle if the new
        # registration omits one (a reload must not silently demote an
        # oracled query to rows-only — ADVICE r9).
        if oracle is None and prev is not None and prev.oracle is not None:
            eff_oracle = prev.oracle
        else:
            eff_oracle = oracle
        eff_max = oracle_exact_max
        if eff_max is None and prev is not None:
            eff_max = prev.oracle_exact_max
        REGISTRY[name] = QuerySpec(
            name, fn, eff_oracle, (fn.__doc__ or "").strip(), eff_max
        )
        return fn

    return deco


def _def_site(fn) -> tuple:
    code = getattr(fn, "__code__", None)
    return (code.co_filename, code.co_firstlineno) if code is not None else ("?", -1)


def _scalar_fingerprint(fn) -> tuple:
    """Hashable summary of a function's distinguishing data: scalar
    closure-cell values and scalar defaults by VALUE (the name/SQL
    strings a query factory bakes in), everything else by type name only
    (objects get new addresses on reload, so identity/repr would make
    every reload look distinct)."""
    _SCALARS = (str, bytes, int, float, bool, type(None))

    def enc(v):
        return ("v", type(v).__name__, v) if isinstance(v, _SCALARS) else (
            "t", type(v).__name__)

    cells = []
    for cell in getattr(fn, "__closure__", None) or ():
        try:
            cells.append(enc(cell.cell_contents))
        except ValueError:  # empty cell
            cells.append(("empty",))
    defaults = tuple(enc(v) for v in (getattr(fn, "__defaults__", None) or ()))
    return (tuple(cells), defaults)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# The driver's correctness sweep truncates to the FIRST 50 registered names,
# so registration order is rotated each round to aim driver evidence at the
# stalest queries.
#
# STANDING POLICY (encode, don't just intend — r9 skipped its promised
# rotation and wasted the round's driver-evidence budget re-proving r8's
# slice): rewrite _PRIORITY as the LAST pre-round step, ordered
#   1. red rows from the previous CORRECTNESS artifact,
#   2. names with NO driver row in any CORRECTNESS_r* (new this round),
#   3. names whose implementation or oracle changed this round,
#   4. the stalest block (oldest latest-evidence round), filling to 50.
# The policy is EXECUTABLE: `python tools/rotation.py [--lead changed,...]
# --write` derives exactly this ordering from the CORRECTNESS artifacts
# and rewrites this tuple (then rerun the pin test + the --exact gate).
#
# --- slice provenance (regenerated by `tools/rotation.py --write`;
#     do not edit by hand — see NOTES.md for the round narrative) ---
# Slice aimed at driver round r16 (catalog 363 queries): 35
# impl/oracle-changed lead names (dq_join_key_skew,
# agg_revenue_concentration, join_negative_sampling,
# dq_sequence_gap_audit, layout_zonemap_pruning_audit,
# corpus_shard_assign, text_vocab_coverage, corpus_shuffle_interleave,
# text_heaps_law, emb_knn_outliers_ivf, events_equidepth_bins,
# events_uplift_qini, events_user_gini, dq_kendall_tau_price,
# q1_pricing_summary, agg_rollup, join_star_3way, join_left_outer,
# join_range, union_by_name, sample_systematic, scalar_math_case,
# join_q5_region_revenue, join_q7_nation_volume, join_q19_or_predicates,
# join_q22_idle_customers, sql_adhoc_q6, join_q17_small_qty_revenue,
# agg_q6_forecast_revenue, join_bloom_prefilter, events_tumbling_hourly,
# events_sliding_window, events_unpivot, join_q9_profit_by_nation,
# join_skew_salted); 2 never-driver-checked (emb_ivf_recall_audit,
# emb_hamming_recall_audit); then 13 stale fills, oldest evidence first
# (rounds r7..r7).
# --- end slice provenance ---
# Queries NOT listed here keep module registration order after the
# block.
_PRIORITY = (
    "dq_join_key_skew",
    "agg_revenue_concentration",
    "join_negative_sampling",
    "dq_sequence_gap_audit",
    "layout_zonemap_pruning_audit",
    "corpus_shard_assign",
    "text_vocab_coverage",
    "corpus_shuffle_interleave",
    "text_heaps_law",
    "emb_knn_outliers_ivf",
    "events_equidepth_bins",
    "events_uplift_qini",
    "events_user_gini",
    "dq_kendall_tau_price",
    "q1_pricing_summary",
    "agg_rollup",
    "join_star_3way",
    "join_left_outer",
    "join_range",
    "union_by_name",
    "sample_systematic",
    "scalar_math_case",
    "join_q5_region_revenue",
    "join_q7_nation_volume",
    "join_q19_or_predicates",
    "join_q22_idle_customers",
    "sql_adhoc_q6",
    "join_q17_small_qty_revenue",
    "agg_q6_forecast_revenue",
    "join_bloom_prefilter",
    "events_tumbling_hourly",
    "events_sliding_window",
    "events_unpivot",
    "join_q9_profit_by_nation",
    "join_skew_salted",
    "emb_ivf_recall_audit",
    "emb_hamming_recall_audit",
    "join_q12_ship_delay",
    "agg_q14_promo_share",
    "join_q16_supplier_cnt",
    "entity_match_trigram",
    "join_q13_order_count_dist",
    "join_q15_top_supplier",
    "join_q8_market_share",
    "window_first_last_nth",
    "rollup_incremental_merge",
    "snapshot_diff_orders",
    "events_hourly_distinct_users",
    "cdc_latest_snapshot",
    "cdc_scd2_history",
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
