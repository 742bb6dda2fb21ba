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
# stalest queries.  Rounds 1-5 each proved a distinct 50-name slice
# (CORRECTNESS_r01..r05 green exactly those slices — zero failures ever).
# Round 6 front-loads the 11 round-5 additions (never driver-checked), then
# the 7 names deferred from the r5 rotation (driver evidence last from r3),
# then 32 of the r4-proven slice (2 rounds stale), alphabetical — the 18
# remaining r4 names (multimodal_*/q1/sample_exact/text_* tail + emb_pq_topk)
# rotate in next round.  Queries NOT listed here keep module registration
# order after the block.
_PRIORITY = (
    # round-5 additions — never driver-checked before this round
    "text_passage_dedup",
    "text_bigram_logprob",
    "text_word_entropy",
    "emb_semantic_dedup",
    "text_bpe_tokens",
    "emb_label_centroids",
    "text_top_ngrams",
    "emb_ivfpq_topk",
    "text_length_histogram",
    "events_anomaly_mad",
    "corpus_dsir_weights",
    # deferred from the r5 rotation — driver evidence last from round 3
    "agg_approx_distinct_hll",
    "sample_bernoulli_seeded",
    "multimodal_features",
    "filter_isin",
    "null_handling",
    "distinct_rows",
    "union_by_name",
    # r4-proven slice, stalest-alphabetical fill to 50
    "agg_count_filter",
    "agg_cube",
    "agg_distinct",
    "agg_grouping_sets",
    "agg_minmax_having",
    "agg_rollup",
    "corpus_filter_pipeline",
    "corpus_mixture_sample",
    "corpus_quality_filter",
    "crossmodal_dup_agreement",
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_keep_list",
    "dedup_winnow_pairs",
    "doc_chunks",
    "emb_cosine_neardup",
    "emb_cosine_topk",
    "emb_quantize_int8",
    "fts_phrase",
    "fts_proximity_ranked",
    "fts_ranked_bm25",
    "fts_ranked_tfidf",
    "fts_search_and",
    "fts_search_not",
    "fts_search_or",
    "fts_top_df_tokens",
    "fts_tsquery_expr",
    "fts_tsquery_phrase",
    "fts_tsquery_prefix",
    "join_full_outer",
    "join_left_outer",
    "join_star_3way",
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
