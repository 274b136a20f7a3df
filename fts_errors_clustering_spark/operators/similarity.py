"""Vector similarity search over the ``embeddings`` table — the ANN
extension family (BASELINE.json north star), three tiers:

1. ``ann_bruteforce_topk`` — exact cosine top-k for a query vector via a
   broadcast join: the correctness baseline, oracle-checked.
2. ``ann_ivf_topk`` — IVF: KMeans coarse quantizer, probe the nearest
   ``N_PROBE`` centroid cells, exact re-rank inside. The scale path: the
   fact-side scan prunes to probed cells (partition by centroid id at rest
   and Catalyst prunes files).
3. ``lsh_neighbor_counts`` — ``BucketedRandomProjectionLSH``
   ``approxSimilarityJoin``: Spark-native candidate generation for
   all-pairs workloads (also the drop-in pair generator for DBSCAN at
   scale — operators/dbscan.py step 1).

Plus ``embedding_near_dup_pairs``: cosine >= threshold near-dup detection
with planted exact duplicates, oracle-checked (the embedding-space member
of the dedup family in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot_agg, sql_cosine
from ..plans.registry import register
from ..sources.readers import table

DIM = 64
TOP_K = 10
QUERY_ID = 0  # the fixture row used as the ANN query vector
N_PROBE = 2


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = {QUERY_ID}),
    scored AS (
      SELECT e.vec_id, {sql_cosine('e.embedding', 'q.qv', DIM)} AS cos
      FROM embeddings e, q
      WHERE e.vec_id <> {QUERY_ID}
    )
    SELECT vec_id, ROUND(cos, 6) AS cosine,
           CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, vec_id) AS BIGINT) AS rnk
    FROM scored ORDER BY cos DESC, vec_id LIMIT {TOP_K}
    """,
    tags=("similarity", "vectors"),
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the 1-row query against the corpus,
    TakeOrderedAndProject for the global top-k (per-partition partial top-k,
    k-row merge — no full sort, no single-partition window)."""
    emb = table(spark, sf_dir, "embeddings")
    q = (emb.where(F.col("vec_id") == QUERY_ID)
         .select(F.col("embedding").alias("qv")))
    scored = (emb.where(F.col("vec_id") != QUERY_ID)
              .crossJoin(F.broadcast(q))
              .select("vec_id", cosine("embedding", "qv", DIM).alias("cos")))
    top = scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOP_K)
    from pyspark.sql import Window
    w = Window.orderBy(F.desc("cos"), F.asc("vec_id"))
    return (top.withColumn("rnk", F.row_number().over(w).cast("long"))
            .select("vec_id", F.round("cos", 6).alias("cosine"), "rnk"))


@register(
    "embedding_near_dup_pairs",
    oracle=f"""
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 100000, embedding FROM embeddings WHERE vec_id < 10
    )
    SELECT a.vec_id AS a, b.vec_id AS b,
           ROUND({sql_cosine('a.embedding', 'b.embedding', DIM)}, 6) AS cosine
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE {sql_cosine('a.embedding', 'b.embedding', DIM)} >= 0.95
    """,
    tags=("similarity", "dedup", "vectors"),
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine >= 0.95) with planted exact
    duplicates (vec_id < 10 re-inserted at +100000) so the detector has
    true positives. Exact all-pairs here; the LSH variant below is the
    candidate generator at scale."""
    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    aug = emb.unionByName(
        emb.where(F.col("vec_id") < 10)
           .select((F.col("vec_id") + 100000).alias("vec_id"), "embedding"))
    a = aug.select(F.col("vec_id").alias("a"), F.col("embedding").alias("va"))
    b = aug.select(F.col("vec_id").alias("b"), F.col("embedding").alias("vb"))
    cos = cosine("va", "vb", DIM)
    return (a.join(b, F.col("a") < F.col("b"))
            .where(cos >= 0.95)
            .select("a", "b", F.round(cos, 6).alias("cosine")))


def _to_vectors(emb: DataFrame) -> DataFrame:
    from pyspark.ml.functions import array_to_vector
    return emb.select("vec_id", "embedding",
                      array_to_vector("embedding").alias("features"))


@register("ann_ivf_topk", oracle=None, tags=("similarity", "vectors", "ml"))
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (rows-only: KMeans-backed): coarse-quantize the corpus with
    KMeans (k=8), assign each vector to its cell, then for the query probe
    the N_PROBE nearest centroids and exact-re-rank only inside those cells.
    Recall vs the exact baseline is asserted in tests/test_similarity.py.

    At rest this layout is ``.write.partitionBy('cell')`` — a query then
    scans ~N_PROBE/k of the data; the plan below mirrors that with a
    cell-membership semi-filter."""
    from pyspark.ml.clustering import KMeans
    emb = _to_vectors(table(spark, sf_dir, "embeddings"))
    km = KMeans(k=8, seed=42, featuresCol="features", predictionCol="cell")
    model = km.fit(emb)
    cells = model.transform(emb).select("vec_id", "embedding", "cell")

    centers = model.clusterCenters()
    qrow = (cells.where(F.col("vec_id") == QUERY_ID)
            .select("embedding").first())
    qv = qrow.embedding
    import math
    dists = [(i, math.dist(qv, c)) for i, c in enumerate(centers)]
    probe = [i for i, _ in sorted(dists, key=lambda t: t[1])[:N_PROBE]]

    q = (cells.where(F.col("vec_id") == QUERY_ID)
         .select(F.col("embedding").alias("qv")))
    cand = cells.where(F.col("cell").isin(probe) &
                       (F.col("vec_id") != QUERY_ID))
    scored = (cand.crossJoin(F.broadcast(q))
              .select("vec_id", cosine("embedding", "qv", DIM).alias("cos")))
    return (scored.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOP_K)
            .select("vec_id", F.round("cos", 6).alias("cosine")))


@register("lsh_neighbor_counts", oracle=None, tags=("similarity", "vectors", "ml"))
def lsh_neighbor_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BucketedRandomProjectionLSH approxSimilarityJoin at distance <= 1.18
    (the DBSCAN eps): per-point approximate neighbor counts. This is the
    M16/M18 candidate generator at 100 TB — bucket-join instead of
    cross-join; recall asserted against the exact counts in tests."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    emb = _to_vectors(table(spark, sf_dir, "embeddings"))
    lsh = BucketedRandomProjectionLSH(inputCol="features", outputCol="hashes",
                                      bucketLength=1.0, numHashTables=6,
                                      seed=42)
    model = lsh.fit(emb)
    pairs = model.approxSimilarityJoin(emb, emb, 1.18, distCol="dist")
    return (pairs.where(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
            .groupBy(F.col("datasetA.vec_id").alias("vec_id"))
            .agg(F.count("*").alias("n_neighbors")))
