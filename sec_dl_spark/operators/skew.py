"""Skew mitigation for hot keys (SURVEY.md §2.11 100 TB design rules).

The EDGAR workload is naturally skewed: a handful of big filers dominate
filing counts (hot CIKs), so a shuffle keyed by cik concentrates those
rows in few tasks. Two standing mitigations, both result-identical to
their unsalted forms:

- AQE skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in
  session.RUNTIME_CONFS) handles sort-merge joins automatically;
- explicit salting below for the cases AQE does not cover: shuffle
  aggregations with expensive per-key state (collect_list/distinct), and
  hash joins where the build side is small enough to replicate but the
  probe side has hot keys and broadcast is not possible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Inner/left join with the dim side replicated ``n_salts`` times and the
    fact side salted pseudo-randomly but deterministically (hash of the whole
    fact row, not rand() — reproducible across retries).

    Each hot fact key now spreads over n_salts shuffle partitions instead of
    one. Cost: dim is shipped n_salts times — use only when dim is small-ish
    but above the broadcast threshold, or when one fact key dominates.
    Result is identical to facts.join(dim, key, how)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    dim_rep = dim.withColumn("_salt", F.explode(salt_values))
    fact_cols = [F.col(c) for c in facts.columns]
    salted = facts.withColumn("_salt", F.pmod(F.xxhash64(*fact_cols), F.lit(n_salts)).cast("int"))
    out = salted.join(dim_rep, [key, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    salt_col: Column,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase skew-safe grouping scaffold: returns the Phase-1 grouping
    frame grouped by (keys + _salt); callers run their partial aggregates on
    it, then re-group by keys for the final combine.

    Only worth it for aggregates with heavy per-key state (collect_list,
    exact distinct) — plain algebraic aggs already combine map-side. See
    skew_salted_distinct() for the canonical two-phase distinct count."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(salt_col), F.lit(n_salts)).cast("int")).groupBy(
        *keys, "_salt"
    )


def salted_distinct_count(
    df: DataFrame, keys: list[str], value: str, n_salts: int = 8
) -> DataFrame:
    """count(DISTINCT value) per keys with the distinct de-dup spread over
    (keys, salt) partitions first: Phase 1 dedups (keys, salt, value) —
    each hot key's values split across n_salts tasks — Phase 2 sums the
    per-salt distinct counts. Salting BY THE VALUE keeps each distinct value
    in exactly one salt bucket, so the per-salt counts add up exactly."""
    phase1 = (
        df.withColumn("_salt", F.pmod(F.xxhash64(F.col(value)), F.lit(n_salts)).cast("int"))
        .select(*keys, "_salt", value)
        .distinct()
        .groupBy(*keys, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("_partial").cast("long").alias(f"n_distinct_{value}"))


def hot_keys(
    df: DataFrame,
    col: str,
    min_fraction: float = 0.01,
    sample_fraction: float = 0.01,
    seed: int = 42,
    eps: float = 1e-4,
    confidence: float = 0.99,
) -> list:
    """Detect keys holding ≥ ``min_fraction`` of ``df`` — the decision
    input for targeted salting — WITHOUT a full groupBy: candidates come
    from a seeded Bernoulli sample (a key covering fraction f appears in
    a sample of n·s rows with probability 1-(1-f)^(n·s) ≈ 1 for any real
    hot key), then each candidate's true weight is checked against a
    count-min sketch built in one pass (estimate ≥ truth, so no hot key
    is MISSED by the verify step; the sample step's miss probability is
    the only sampling risk and is astronomically small at scale).

    Cost: one sample scan + one sketch pass, both O(data) with tiny
    state — no shuffle keyed by the (skewed!) column itself, which is
    exactly the shuffle a plain groupBy-count diagnostic would suffer."""
    from sec_dl_spark.operators.sketch import cms_counts

    n = df.count()
    if n == 0:
        return []
    cand = [
        r[0]
        for r in df.select(col)
        .sample(fraction=min(1.0, sample_fraction), seed=seed)
        .groupBy(col)
        .count()
        .where(F.col("count") >= 2)  # singleton sample hits are noise
        .collect()
    ]
    if not cand:
        return []
    est = cms_counts(df, col, cand, eps=eps, confidence=confidence, seed=seed)
    cut = min_fraction * n
    # CMS is one-sided (estimate ≥ truth), so comparing est >= cut keeps
    # the no-miss guarantee the docstring promises: every truly hot key
    # passes. The cost is keys up to eps·n UNDER the threshold may be
    # promoted by sketch error — benign here, because the consumer salts
    # the key, and salting a borderline-hot key is harmless while FAILING
    # to salt a genuinely hot one is the error that matters.
    return sorted(k for k, e in est.items() if e >= cut)
