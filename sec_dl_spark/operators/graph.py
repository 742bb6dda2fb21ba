"""Iterative graph algorithms over edge DataFrames.

Companion to operators/dedup.py:duplicate_clusters (pointer-jumping
connected components): where components need O(log d) halving rounds,
ranking algorithms like PageRank run a FIXED number of dense iterations —
each one a join + aggregate, the classic Pregel step expressed as
DataFrame ops.

Scale notes (100 TB):
- each iteration shuffles the edge list once (hash on src) and the rank
  vector once (hash on dst) — cost is O(iterations × |E|), never
  materializing anything denser;
- the rank vector is O(|V|) and re-partitions on the same key every
  round, so AQE folds consecutive exchanges;
- lineage grows linearly with iterations — callers running tens of
  rounds should pass ``persist_every`` so each checkpointed iteration
  truncates the plan (local action, no driver collect).

Determinism: ranks use FIXED-POINT integer arithmetic (scaled by 1e9).
Floating-point PageRank is summation-order-dependent — two runs (or two
engines) disagree in the last ulp and ranking becomes unverifiable.
Integer contributions ``pr div out_deg`` summed exactly make every
iteration reproducible bit-for-bit on any partitioning and any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sec_dl_spark.session import pin

SCALE = 1_000_000_000


def pagerank_fixed_point(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    persist_every: int | None = None,
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list (send both directions
    for an undirected graph). Returns (id, pr_int) where ``pr_int`` is the
    rank scaled by 1e9; every operation is integer (div/sum/multiply), so
    the result is deterministic and byte-comparable across engines.

    pr_0 = SCALE for every node;
    pr_{t+1} = (1-d)·SCALE + d · Σ_{in-edges} (pr_t div out_deg), with the
    damping d applied as an exact integer ratio (``85/100``). Dangling
    nodes never arise when the caller symmetrizes edges; otherwise their
    mass drains (the standard simplification).

    The edge list, degrees, and node set are iteration-INVARIANT, so they
    are pinned up front: without this, every iteration re-executes the
    caller's edge-building lineage (often an expensive similarity join) —
    the 10× scale probe caught exactly that regression on the near-dup
    graph, where 5 iterations re-ran the label-blocked cosine join 5
    times. Pinned via :func:`sec_dl_spark.session.pin` rather than
    ``persist``: the blocks are edge-list-sized either way, but persisted
    frames stay registered in the CacheManager for the SESSION's life
    (one leaked copy per call), while checkpointed RDD blocks are
    released by the ContextCleaner once the result frame is garbage
    collected — and the caller's edge lineage is truncated out of every
    iteration's plan as a bonus.

    Pinning semantics callers inherit: this function is EAGER (it runs
    Spark jobs at call time), and default pinned blocks are
    executor-local — lost blocks are NOT recomputable under executor
    loss / dynamic-allocation shrink / spot preemption. Preemptible
    fleets: set ``spark.sec_dl_spark.reliableCheckpoint=true`` plus
    ``setCheckpointDir`` so every pin (including ``persist_every``
    iteration pins) lands on reliable storage.
    """
    e = pin(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    deg = pin(e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    nodes = pin(
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    base = (damping_den - damping_num) * SCALE // damping_den
    pr = nodes.withColumn("pr", F.lit(SCALE).cast("long"))
    for it in range(iterations):
        contribs = (
            e.join(pr.withColumnRenamed("id", "src"), "src")
            .join(deg, "src")
            .select("dst", F.expr("pr div deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("acc"))
        )
        pr = nodes.join(
            contribs.withColumnRenamed("dst", "id"), "id", "left"
        ).select(
            "id",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(acc, 0L)) div {damping_den}")
            ).cast("long").alias("pr"),
        )
        if persist_every and (it + 1) % persist_every == 0 and it + 1 < iterations:
            # pin TRUNCATES lineage (the plan becomes an RDD scan):
            # persist()+count() materializes but the logical plan still
            # carries — and the explain text re-embeds — the full
            # iteration history, so planner work and plan size kept
            # growing with iterations (the r7 850-exchange finding).
            # Executor-loss tradeoff + the reliable-storage escape hatch
            # are pin()'s documented contract.
            pr = pin(pr)
    return pr.select("id", F.col("pr").alias("pr_int"))
