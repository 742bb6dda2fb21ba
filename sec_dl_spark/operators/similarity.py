"""Vector similarity search over an embedding column (SURVEY.md §2.11).

Baseline: exact brute-force cosine top-k — broadcast the (small) query set,
compute dot products with JVM-side higher-order functions (zip_with +
aggregate, no Python in the loop), rank per query with a window.

Scale path: BucketedRandomProjectionLSH over L2-normalized vectors —
cosine NN ≡ euclidean NN on the unit sphere — so candidate generation is a
bucket join instead of a cross product. An IVF-style variant (coarse
k-means centroids → probe nearest cells) drops in the same shape; LSH is
the shipped one because it is deterministic under a fixed seed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two ARRAY<numeric> columns, computed in double."""
    ad = F.transform(a, lambda x: x.cast("double"))
    bd = F.transform(b, lambda x: x.cast("double"))
    return _dot(ad, bd) / (_norm(ad) * _norm(bd))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (self-matches excluded).

    queries is broadcast (it is the small side); the corpus streams through
    one narrow stage; ranking is a per-query window. Returns
    (query_id, neighbor_id, cosine_sim, rank).
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def normalize_vec(col: Column) -> Column:
    """L2-normalize an array column (maps cosine to euclidean geometry)."""
    n = _norm(F.transform(col, lambda x: x.cast("double")))
    return F.transform(col, lambda x: x.cast("double") / n)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_length: float = 0.5,
    num_tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via BucketedRandomProjectionLSH on unit vectors.

    euclidean_dist² = 2 - 2·cos on the unit sphere, so nearest-euclidean ==
    nearest-cosine. Candidates come from LSH bucket joins (approxSimilarityJoin
    with a generous radius), then exact re-ranking keeps top-k — the standard
    ANN recall/latency trade. Deterministic under the fixed seed."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    def prep(df: DataFrame, out_id: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(out_id),
            array_to_vector(normalize_vec(F.col(vec_col))).alias("features"),
        )

    c = prep(corpus, "neighbor_id")
    q = prep(queries, "query_id")
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=bucket_length, numHashTables=num_tables, seed=seed
    )
    model = lsh.fit(c)
    # radius 2.0 covers cos >= -1; bucket pruning still applies per table.
    joined = model.approxSimilarityJoin(c, q, 2.0, distCol="dist")
    scored = (
        joined.where(F.col("datasetA.neighbor_id") != F.col("datasetB.query_id"))
        .select(
            F.col("datasetB.query_id").alias("query_id"),
            F.col("datasetA.neighbor_id").alias("neighbor_id"),
            F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via an IVF (inverted-file) index: coarse k-means
    centroids partition the corpus into cells; each query probes only its
    ``n_probe`` nearest cells and exact-reranks the candidates.

    The scan cost drops from |corpus| to ~|corpus|·n_probe/n_cells per
    query; at cluster scale the cell assignment is the partitioning key, so
    a query touches n_probe partitions instead of the whole table. The
    centroid table (n_cells rows) broadcasts. Deterministic under the fixed
    k-means seed. Returns (query_id, neighbor_id, cosine_sim, rank)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    c_feat = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        array_to_vector(normalize_vec(F.col(vec_col))).alias("features"),
    )
    km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
    model = km.fit(c_feat)
    assigned = model.transform(c_feat).select("neighbor_id", "c_vec", "cell")

    centroids = F.broadcast(
        corpus.sparkSession.createDataFrame(
            [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
            ["cell", "centroid"],
        )
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = Window.partitionBy("query_id").orderBy(F.col("centroid_sim").desc(), F.col("cell"))
    probes = (
        q.crossJoin(centroids)
        .select(
            "query_id",
            "q_vec",
            "cell",
            cosine(F.col("q_vec"), F.col("centroid")).alias("centroid_sim"),
        )
        .withColumn("_pr", F.row_number().over(probe_w))
        .where(F.col("_pr") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine_sim").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)
