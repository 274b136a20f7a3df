"""End-to-end pipeline compositions — the reference's two flagship flows
(SURVEY.md section 3.3), each as one declarative chain over the fixtures:

A. TF-IDF flavor: tokenize -> stopwords -> CountVectorizer -> IDF ->
   Normalizer -> LSA(PCA) -> KMeans -> external metrics
   (``/root/reference/notebooks/TF-IDF_K-Means_approach.ipynb`` cells
   31-45: fit at ``:7826``, LSA ``:7844``, KMeans ``:7902``, metrics
   ``:8163-8171``).
B. word2vec flavor: mask -> tokenize -> Word2Vec (doc mean-pool) ->
   kNN/knee epsilon -> DBSCAN -> per-cluster summary
   (``word2vec_dbscan_approach.ipynb``: clean ``:401``, tokenize ``:469``,
   train ``:28588``, kNN ``:28950``, knee ``:30035``, DBSCAN ``:30082``,
   summary ``:30189-30220``).

Unlike the reference, labels stay in-row end to end (ml transformers append
``prediction``; DBSCAN output joins by id) — no positional zips, and row
counts are stable by construction (SURVEY.md 2.9 defect classes 1-3).
Model-backed -> rows-only driver checks; invariants in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import fuzz_ratio, mask_error_text, whitespace_tokens
from ..plans.registry import register
from ..sources.readers import table
from .clustering import external_cluster_metrics, fit_kmeans_best, fit_word2vec
from .dbscan import dbscan_labels
from .tfidf import fit_lsa_svd, fit_tfidf


@register("pipeline_tfidf_kmeans", oracle=None, tags=("pipeline", "ml"))
def pipeline_tfidf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow A on ``documents`` (lang as the pseudo-label standing in for the
    reference's ``category``): returns the evaluation row — cluster count,
    homogeneity/completeness/V/ARI — the shape of the reference's cell 45."""
    docs = table(spark, sf_dir, "documents")
    _, feats = fit_tfidf(docs, cache_key=sf_dir)
    # reference-faithful reduction: truncated SVD (no mean-centering), then
    # L2 re-normalization — fit_lsa (PCA) remains the documented fallback
    svd_out, _ = fit_lsa_svd(feats, k=10)
    from pyspark.ml.functions import array_to_vector
    nrm = F.sqrt(F.aggregate("lsa_svd", F.lit(0.0), lambda a, x: a + x * x))
    reduced = (svd_out
               .join(feats.select("doc_id", "lang"), "doc_id")
               .select("doc_id", "lang", array_to_vector(
                   F.when(nrm > 0, F.transform("lsa_svd", lambda x: x / nrm))
                    .otherwise(F.col("lsa_svd"))).alias("lsa_features"))
               .cache())
    model = fit_kmeans_best(reduced, k=10, n_init=2,
                            features_col="lsa_features")
    out = model.transform(reduced).cache()
    metrics = external_cluster_metrics(out, "lang", "prediction")
    n_clusters = out.select("prediction").distinct().count()
    return metrics.withColumn("n_clusters", F.lit(n_clusters).cast("long"))


@register("pipeline_word2vec_dbscan", oracle=None, tags=("pipeline", "ml"))
def pipeline_word2vec_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flow B on ``documents``: the full mask -> tokenize -> word2vec ->
    kNN-knee epsilon -> DBSCAN -> cluster_stats chain. Returns the M20
    summary table (cluster, size, mean/std similarity-to-first)."""
    docs = table(spark, sf_dir, "documents")
    toks = (docs.where(F.length(F.trim("text")) > 0)
            .select("doc_id", "text",
                    whitespace_tokens(mask_error_text("text")).alias("tokens")))
    w2v = fit_word2vec(toks, vector_size=32, cache_key=sf_dir)
    from pyspark.ml.functions import vector_to_array
    emb = (w2v.transform(toks)
           .select("doc_id", "text",
                   vector_to_array("doc_vec").cast("array<float>")
                    .alias("embedding"))
           .cache())

    # knee-derived epsilon on the doc embeddings (M16+M17 inline, dim=32):
    # numpy-kernel candidate pruning + exact re-rank — the knn.py plan, NOT
    # the O(n^2)-pairs-through-an-expression cross join (the anti-pattern
    # pairwise.py's header documents as ~134 s of a 135 s run)
    from ..functions.vectors import euclidean_arrow
    from .pairwise import topk_candidate_pairs
    n = emb.count()
    k = max(2, int(round(n ** 0.5)))
    cand = topk_candidate_pairs(emb, "doc_id", "embedding", k)
    a = emb.select(F.col("doc_id").alias("i"), F.col("embedding").alias("va"))
    b = emb.select(F.col("doc_id").alias("j"), F.col("embedding").alias("vb"))
    pairs = (cand.join(F.broadcast(a), cand.a == a.i)
             .join(F.broadcast(b), cand.b == b.j)
             .select("i", "j", euclidean_arrow("va", "vb").alias("dist")))
    w = Window.partitionBy("i").orderBy(F.asc("dist"), F.asc("j"))
    knn = (pairs.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
           .groupBy("i").agg(F.avg("dist").alias("mean_dist")))
    # distributed knee (knn.py plan): only the 1-row argmax reaches the
    # driver — never the per-point curve (at 10^9 embeddings a curve
    # collect() is a multi-GB driver pull). If the knee lands degenerate on
    # a given corpus (one giant cluster — the reference hit this and
    # hand-set eps=20), pass eps to dbscan_labels explicitly.
    from .knn import knee_epsilon_value
    eps = knee_epsilon_value(knn, id_col="i")

    labels = dbscan_labels(spark, emb, id_col="doc_id", dim=32,
                           eps=float(eps), min_pts=5)
    joined = emb.join(labels, "doc_id")  # in-row by id, never positional
    # representative text per cluster via min_by + broadcast join, NOT a
    # partitionBy(cluster) window: a dominant cluster (the knee's eps is
    # degenerate on this corpus, as in the reference notebook) would put
    # the whole corpus — and every levenshtein below — in ONE window
    # partition; the aggregate keeps the expensive fuzz_ratio fully parallel
    firsts = (joined.groupBy("cluster")
              .agg(F.min_by("text", "doc_id").alias("first_text")))
    sims = (joined.join(F.broadcast(firsts), "cluster")
            .withColumn("sim", fuzz_ratio("text", "first_text")))
    return (sims.groupBy("cluster")
            .agg(F.count("*").alias("n_docs"),
                 F.round(F.avg("sim"), 4).alias("mean_similarity"),
                 F.round(F.stddev("sim"), 4).alias("std_similarity"))
            .orderBy("cluster"))


# --- S5/S6: filesystem + catalog listings ------------------------------------

def list_files(spark: SparkSession, path: str) -> list[str]:
    """S5 rebuild (``rucio_data_access_HDFS.ipynb:203-205``): the py4j
    Hadoop FileSystem listing, for the rare case a glob can't express the
    selection (globs + partition pruning are the default)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return [str(s.getPath()) for s in fs.listStatus(p)]


def list_catalog_tables(spark: SparkSession) -> list[str]:
    """S6 rebuild (``rucio_data_access_HDFS.ipynb:118``)."""
    return [t.name for t in spark.catalog.listTables()]
