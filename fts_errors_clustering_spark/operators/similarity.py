"""Vector similarity search over the ``embeddings`` table — the ANN
extension family (BASELINE.json north star), four tiers:

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
4. ``ann_pq_topk`` — product quantization (Jegou et al. 2011): the
   compressed memory-tier index — M_SUB-byte codes per vector, query-time
   asymmetric-distance lookups, exact re-rank of the candidate set.

Plus ``embedding_near_dup_pairs``: cosine >= threshold near-dup detection
with planted exact duplicates, oracle-checked (the embedding-space member
of the dedup family in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot_agg, norm, sql_cosine, sql_norm
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


N_QUERIES = 4       # batch-ANN query set: vec_id < N_QUERIES
BATCH_K = 5
SALT_P = 16         # first-level top-k fan-out for the salted window


@register(
    "ann_batch_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id < {N_QUERIES}),
    scored AS (
      SELECT q.qid, e.vec_id, {sql_cosine('e.embedding', 'q.qv', DIM)} AS cos
      FROM embeddings e, q WHERE e.vec_id >= {N_QUERIES}
    ),
    ranked AS (
      SELECT qid, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cos DESC, vec_id) AS rn
      FROM scored
    )
    SELECT qid, vec_id, ROUND(cos, 6) AS cosine, CAST(rn AS BIGINT) AS rnk
    FROM ranked WHERE rn <= {BATCH_K}
    """,
    tags=("similarity", "vectors"),
)
def ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch ANN: exact cosine top-{BATCH_K} for a SET of query vectors in
    one pass — the bulk-retrieval shape (dedup against an index, RAG batch
    scoring). The query set broadcasts; the corpus is scanned once.

    Scale note: a single window partitioned by qid would funnel the whole
    corpus's scored rows for one query through one task. Instead top-k runs
    in TWO window levels: first within (qid, salt = vec_id mod {SALT_P}) —
    partitions of ~corpus/{SALT_P} rows — keeping {BATCH_K} survivors each,
    then a final window over the {SALT_P} x {BATCH_K} survivors per query.
    Both windows are pure Catalyst; the cosine is computed once before the
    first window, so the re-rank re-orders, never re-computes."""
    emb = table(spark, sf_dir, "embeddings")
    q = (emb.where(F.col("vec_id") < N_QUERIES)
         .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")))
    scored = (emb.where(F.col("vec_id") >= N_QUERIES)
              .crossJoin(F.broadcast(q))
              .select("qid", "vec_id", cosine("embedding", "qv", DIM).alias("cos"),
                      F.pmod(F.col("vec_id"), F.lit(SALT_P)).alias("salt")))
    from pyspark.sql import Window
    w1 = Window.partitionBy("qid", "salt").orderBy(F.desc("cos"), F.asc("vec_id"))
    survivors = (scored.withColumn("rn", F.row_number().over(w1))
                 .where(F.col("rn") <= BATCH_K).drop("rn", "salt"))
    w2 = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (survivors.withColumn("rnk", F.row_number().over(w2).cast("long"))
            .where(F.col("rnk") <= BATCH_K)
            .select("qid", "vec_id", F.round("cos", 6).alias("cosine"), "rnk"))


def _dec_sum(col):
    """Order-insensitive exact sum of doubles: per-term decimal(27,18) cast,
    decimal accumulate, string->double round-trip (functions/numeric.py
    rationale)."""
    return (F.sum(col.cast("decimal(27,18)")).cast("string").cast("double"))


_SQL_DEC_SUM = ("CAST(CAST(SUM(CAST({x} AS DECIMAL(27,18))) AS VARCHAR) "
                "AS DOUBLE)")


@register(
    "label_centroid_cosine",
    oracle=f"""
    WITH pe AS (
      SELECT label, p.pos AS pos, CAST(p.val AS DOUBLE) AS val FROM (
        SELECT label,
               unnest(list_transform(range(1, len(embedding) + 1),
                      i -> struct_pack(pos := i, val := embedding[i]))) AS p
        FROM embeddings
      )
    ),
    cent AS (
      SELECT label, pos,
             {_SQL_DEC_SUM.format(x='val')} / COUNT(*) AS m
      FROM pe GROUP BY label, pos
    ),
    pairs AS (
      SELECT a.label AS label_a, b.label AS label_b,
             {_SQL_DEC_SUM.format(x='a.m * b.m')} AS ab,
             {_SQL_DEC_SUM.format(x='a.m * a.m')} AS aa,
             {_SQL_DEC_SUM.format(x='b.m * b.m')} AS bb
      FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
      GROUP BY a.label, b.label
    )
    SELECT label_a, label_b, ROUND(ab / (sqrt(aa) * sqrt(bb)), 6) AS cosine
    FROM pairs
    """,
    tags=("similarity", "vectors"),
)
def label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid similarity matrix: mean embedding per label, then
    pairwise cosine between label centroids — the class-separation /
    embedding-drift diagnostic for a labeled corpus. Long-form throughout:
    (label, pos) per-dimension decimal-exact means, a pos-equijoin for the
    pairwise dots, one small aggregate — no dense matrices, no UDFs, and
    the big shuffle is the map-side-combinable (label, pos) aggregate whose
    output is only |labels| x dim rows."""
    emb = table(spark, sf_dir, "embeddings")
    pe = emb.select("label", F.posexplode("embedding").alias("pos", "valf"))
    pe = pe.select("label", (F.col("pos") + 1).alias("pos"),
                   F.col("valf").cast("double").alias("val"))
    cent = (pe.groupBy("label", "pos")
            .agg((_dec_sum(F.col("val")) / F.count("*")).alias("m")))
    a = cent.select(F.col("label").alias("label_a"), "pos",
                    F.col("m").alias("ma"))
    b = cent.select(F.col("label").alias("label_b"),
                    F.col("pos").alias("posb"), F.col("m").alias("mb"))
    pairs = (a.join(b, (F.col("pos") == F.col("posb")) &
                    (F.col("label_a") < F.col("label_b")))
             .groupBy("label_a", "label_b")
             .agg(_dec_sum(F.col("ma") * F.col("mb")).alias("ab"),
                  _dec_sum(F.col("ma") * F.col("ma")).alias("aa"),
                  _dec_sum(F.col("mb") * F.col("mb")).alias("bb")))
    return pairs.select(
        "label_a", "label_b",
        F.round(F.col("ab") / (F.sqrt("aa") * F.sqrt("bb")), 6).alias("cosine"))


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


# --- tier 4: product quantization (Jegou et al. 2011, public method) ---------

M_SUB = 8                 # subspaces
SUB_DIM = DIM // M_SUB    # dims per subspace
PQ_K = 32                 # centroids per subspace codebook
PQ_CAND = 100             # approx candidates kept for exact re-rank


PQ_SAMPLE = 4096          # codebook training sample (driver-side numpy)


def _lloyd(X, k: int, seed: int, iters: int = 25):
    """Driver-side Lloyd's k-means (k-means++ init) on a small numpy
    sample — PQ codebooks train on a few thousand subvectors by design
    (Jegou et al. train on samples), so a full distributed fit per
    subspace would be M_SUB jobs of pure overhead."""
    import numpy as np
    rng = np.random.default_rng(seed)
    # k-means++ seeding
    cents = [X[rng.integers(len(X))]]
    for _ in range(k - 1):
        d2 = np.min([((X - c) ** 2).sum(1) for c in cents], axis=0)
        p = d2 / max(d2.sum(), 1e-12)
        cents.append(X[rng.choice(len(X), p=p)])
    C = np.array(cents)
    for _ in range(iters):
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
        a = d.argmin(1)
        for j in range(k):
            pts = X[a == j]
            if len(pts):
                C[j] = pts.mean(0)
    return C


def fit_pq_codebooks(emb: DataFrame) -> list[list[list[float]]]:
    """Per-subspace codebooks: split each vector into M_SUB contiguous
    SUB_DIM-slices and quantize each slice independently (k=PQ_K per
    subspace) with Lloyd's on a PQ_SAMPLE-row driver sample (the
    broadcast-class collect every PQ implementation makes — codebooks are
    trained on samples, applied distributed). Returns M_SUB codebooks."""
    import numpy as np
    rows = (emb.select("embedding").limit(PQ_SAMPLE).collect())
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    return [
        [[float(x) for x in c]
         for c in _lloyd(X[:, m * SUB_DIM:(m + 1) * SUB_DIM], PQ_K, 42 + m)]
        for m in range(M_SUB)
    ]


def pq_encode(emb: DataFrame, books) -> DataFrame:
    """Attach the PQ code columns (one small int per subspace): per
    subspace, squared distance to each of the PQ_K centroids as an array
    fold, argmin via array_position — all JVM column algebra, codegen-
    bounded at M_SUB x PQ_K small folds. The encoded corpus is
    M_SUB bytes/vector of payload instead of DIM floats (32x here)."""
    cols = []
    for m, book in enumerate(books):
        sub = F.slice("embedding", m * SUB_DIM + 1, SUB_DIM).cast("array<double>")
        dists = F.array(*[
            F.aggregate(F.zip_with(sub, F.array(*[F.lit(x) for x in c]),
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0), lambda acc, v: acc + v)
            for c in book])
        cols.append((F.array_position(dists, F.array_min(dists)) - 1)
                    .cast("int").alias(f"code{m}"))
    return emb.select("vec_id", "embedding", *cols)


@register("ann_pq_topk", oracle=None, tags=("similarity", "vectors", "ml"))
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ANN (rows-only: KMeans-backed): product-quantization codes +
    asymmetric distance. The corpus is scanned as M_SUB-byte codes; the
    query's per-(subspace, centroid) squared-distance table (M_SUB x PQ_K
    doubles, computed on the driver) broadcasts as literal lookup arrays,
    so the approximate distance is M_SUB ``element_at`` lookups per vector
    — no float vector math in the scan. Top-PQ_CAND approx candidates are
    exact-cosine re-ranked to the final top-{TOP_K}. Recall vs the exact
    baseline asserted in tests/test_similarity.py.

    At 100 TB this is the memory-tier index: 32x smaller than raw floats,
    scan-friendly (codes are parquet ints), with the codebooks (M_SUB x
    PQ_K x SUB_DIM floats) trivially broadcastable. IVF cells compose with
    it (IVF-PQ) by running this scan per probed cell."""
    import math
    raw = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # L2-normalize the indexed vectors: on the unit sphere, squared L2 is
    # a monotone function of cosine (||a-b||^2 = 2 - 2cos), so the
    # L2-trained codebooks and L2 asymmetric distance RANK by cosine —
    # without this, high-cosine/different-magnitude neighbors fall outside
    # the candidate set no matter how many candidates are kept
    nrm = F.sqrt(F.aggregate(F.col("embedding").cast("array<double>"),
                             F.lit(0.0), lambda a, x: a + x * x))
    emb = raw.select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: x / nrm).alias("embedding"))
    books = fit_pq_codebooks(emb)
    coded = pq_encode(emb, books)

    qv = [float(x) for x in
          emb.where(F.col("vec_id") == QUERY_ID).first().embedding]
    # asymmetric distance table: ||q_sub - centroid||^2 per (subspace, code)
    tables = [[math.fsum((qv[m * SUB_DIM + i] - c[i]) ** 2
                         for i in range(SUB_DIM)) for c in book]
              for m, book in enumerate(books)]
    adist = None
    for m in range(M_SUB):
        term = F.element_at(F.array(*[F.lit(d) for d in tables[m]]),
                            F.col(f"code{m}") + 1)
        adist = term if adist is None else adist + term
    cand = (coded.where(F.col("vec_id") != QUERY_ID)
            .select("vec_id", "embedding", adist.alias("adist"))
            .orderBy(F.asc("adist"), F.asc("vec_id")).limit(PQ_CAND))

    q = (raw.where(F.col("vec_id") == QUERY_ID)
         .select(F.col("embedding").alias("qv")))
    rer = (cand.select("vec_id").join(raw, "vec_id")
           .crossJoin(F.broadcast(q))
           .select("vec_id", cosine("embedding", "qv", DIM).alias("cos")))
    return (rer.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOP_K)
            .select("vec_id", F.round("cos", 6).alias("cosine")))


# --- tier 4b: IVF-PQ composition (residual-encoded, the big-corpus index) ----

IVFPQ_CELLS = 8
IVFPQ_PROBE = 3


def ivfpq_topk(raw: DataFrame, query_id: int = QUERY_ID) -> DataFrame:
    """IVF-PQ core over a (vec_id, embedding) frame — see ``ann_ivfpq_topk``.

    IVF-PQ: the coarse-quantizer cells of ``ann_ivf_topk`` composed with
    the PQ codes of ``ann_pq_topk``, encoding RESIDUALS (x - cell centroid)
    as classic IVF-PQ does — residuals concentrate around 0, so the same
    codebook budget quantizes them with far less distortion than raw
    vectors.

    All training happens on a driver-side sample (numpy Lloyd's: one k=8
    coarse codebook + M_SUB residual codebooks); everything corpus-sized is
    JVM column algebra: cell assignment and code assignment are argmin
    folds over literal centroids, the probe-time approximate distance is
    M_SUB ``element_at`` lookups against the PROBED CELL's distance table
    (tables differ per cell because the query residual does). Candidates
    come only from the N_PROBE nearest cells — at rest, files partitioned
    by cell make that a pruned scan — and the final top-k is an exact
    cosine re-rank of PQ_CAND survivors against the raw vectors.
    """
    import math

    import numpy as np
    nrm = F.sqrt(F.aggregate(F.col("embedding").cast("array<double>"),
                             F.lit(0.0), lambda a, x: a + x * x))
    emb = raw.select(
        "vec_id",
        F.transform(F.col("embedding").cast("array<double>"),
                    lambda x: x / nrm).alias("embedding"))

    sample = np.array([r.embedding for r in
                       emb.select("embedding").limit(PQ_SAMPLE).collect()],
                      dtype=np.float64)
    coarse = _lloyd(sample, IVFPQ_CELLS, seed=7)
    # residual codebooks, per subspace, trained on sample residuals
    s_cells = ((sample[:, None, :] - coarse[None, :, :]) ** 2).sum(2).argmin(1)
    resid = sample - coarse[s_cells]
    books = [
        [[float(x) for x in c]
         for c in _lloyd(resid[:, m * SUB_DIM:(m + 1) * SUB_DIM], PQ_K, 77 + m)]
        for m in range(M_SUB)
    ]

    # corpus-side: cell = argmin over the 8 coarse centroids (JVM folds)
    cell_d = F.array(*[
        F.aggregate(F.zip_with("embedding",
                               F.array(*[F.lit(float(x)) for x in c]),
                               lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0), lambda acc, v: acc + v)
        for c in coarse])
    centro = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in coarse])
    with_cell = emb.select(
        "vec_id", "embedding",
        (F.array_position(cell_d, F.array_min(cell_d)) - 1).cast("int")
        .alias("cell"))
    residual = F.zip_with("embedding",
                          F.element_at(centro, F.col("cell") + 1),
                          lambda a, b: a - b)
    with_res = with_cell.select("vec_id", "cell", residual.alias("res"))
    code_cols = []
    for m, book in enumerate(books):
        sub = F.slice("res", m * SUB_DIM + 1, SUB_DIM)
        dists = F.array(*[
            F.aggregate(F.zip_with(sub, F.array(*[F.lit(x) for x in c]),
                                   lambda a, b: (a - b) * (a - b)),
                        F.lit(0.0), lambda acc, v: acc + v)
            for c in book])
        code_cols.append((F.array_position(dists, F.array_min(dists)) - 1)
                         .cast("int").alias(f"code{m}"))
    coded = with_res.select("vec_id", "cell", *code_cols)

    # query-side: probe the N_PROBE nearest cells; one distance table per
    # probed cell (query residual differs per cell)
    qn = [float(x) for x in
          emb.where(F.col("vec_id") == query_id).first().embedding]
    qd = [(i, sum((qn[j] - coarse[i][j]) ** 2 for j in range(DIM)))
          for i in range(IVFPQ_CELLS)]
    probes = [i for i, _ in sorted(qd, key=lambda t: t[1])[:IVFPQ_PROBE]]
    tables = {}
    for p in probes:
        qr = [qn[j] - float(coarse[p][j]) for j in range(DIM)]
        tables[p] = [[math.fsum((qr[m * SUB_DIM + i] - c[i]) ** 2
                                for i in range(SUB_DIM)) for c in books[m]]
                     for m in range(M_SUB)]

    def _adist(p: int):
        acc = None
        for m in range(M_SUB):
            term = F.element_at(
                F.array(*[F.lit(d) for d in tables[p][m]]),
                F.col(f"code{m}") + 1)
            acc = term if acc is None else acc + term
        return acc

    adist = F.when(F.col("cell") == probes[0], _adist(probes[0]))
    for p in probes[1:]:
        adist = adist.when(F.col("cell") == p, _adist(p))
    cand = (coded.where(F.col("cell").isin([int(p) for p in probes]) &
                        (F.col("vec_id") != query_id))
            .select("vec_id", adist.alias("adist"))
            .orderBy(F.asc("adist"), F.asc("vec_id")).limit(PQ_CAND))

    q = (raw.where(F.col("vec_id") == query_id)
         .select(F.col("embedding").alias("qv")))
    rer = (cand.select("vec_id").join(raw, "vec_id")
           .crossJoin(F.broadcast(q))
           .select("vec_id", cosine("embedding", "qv", DIM).alias("cos")))
    return (rer.orderBy(F.desc("cos"), F.asc("vec_id")).limit(TOP_K)
            .select("vec_id", F.round("cos", 6).alias("cosine")))


@register("ann_ivfpq_topk", oracle=None, tags=("similarity", "vectors", "ml"))
def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ top-{TOP_K} on the fixture embeddings (see ``ivfpq_topk``).
    Rows-only; planted-neighbor rank-1 recovery and agreement floors in
    tests/test_similarity.py. Caveat measured on the fixture: the query's
    true top-10 sit at cosine ~0.3 (noise-level), so they scatter across
    coarse cells and ANY inverted-file index probe-loses some — the
    planted-neighbor test is the semantically meaningful gate; the
    agreement floor documents the noise-regime behavior."""
    return ivfpq_topk(table(spark, sf_dir, "embeddings")
                      .select("vec_id", "embedding"))


@register(
    "embedding_quantization_error",
    oracle=f"""
    WITH flat AS (
      SELECT t.i AS dim, CAST(embedding[t.i + 1] AS DOUBLE) AS val
      FROM embeddings, range(0, {DIM}) t(i)
    ),
    stats AS (
      SELECT dim, MIN(val) AS vmin, MAX(val) AS vmax FROM flat GROUP BY dim
    ),
    err AS (
      SELECT f.dim, s.vmin, s.vmax,
             CASE WHEN s.vmax = s.vmin THEN 0.0 ELSE
               (f.val - (s.vmin + ROUND((f.val - s.vmin) /
                                        ((s.vmax - s.vmin) / 255.0))
                                  * ((s.vmax - s.vmin) / 255.0)))
               * (f.val - (s.vmin + ROUND((f.val - s.vmin) /
                                          ((s.vmax - s.vmin) / 255.0))
                                    * ((s.vmax - s.vmin) / 255.0)))
             END AS sqerr
      FROM flat f JOIN stats s USING (dim)
    )
    SELECT CAST(dim AS BIGINT) AS dim,
           MIN(vmin) AS vmin, MIN(vmax) AS vmax,
           ROUND({_SQL_DEC_SUM.format(x='sqerr')} / COUNT(*), 12) AS mse_q8
    FROM err GROUP BY dim
    """,
    tags=("similarity", "vectors", "curation"),
)
def embedding_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 affine-quantization audit per embedding dimension: for each dim,
    the (min, max) calibration range, and the mean squared reconstruction
    error of symmetric-grid uint8 quantization ``q = round((v - min)/s)``,
    ``s = (max - min)/255`` — the storage-tier decision table for shipping a
    100 TB embedding corpus as 1/4-size int8 (the same calibration sweep a
    PQ/IVF build runs before choosing codebook bits).

    Determinism across engines: every arithmetic step (subtract, divide,
    round-half-away-from-zero on non-negative input, multiply) maps IEEE
    doubles to IEEE doubles identically in Spark and DuckDB, and the only
    aggregate over non-identical magnitudes (the sqerr sum) goes through the
    order-insensitive decimal accumulator (functions/numeric.py rationale).

    Scale: posexplode streams (dim, val) pairs; the 64-row per-dim stats
    aggregate is map-side combined, broadcast back for the error pass, and
    the final aggregate is again 64 keys — no row ever carries the full
    vector through a shuffle, and no stage materializes a dense matrix.
    """
    emb = table(spark, sf_dir, "embeddings")
    flat = (emb.select(F.posexplode("embedding").alias("dim", "valf"))
            .select("dim", F.col("valf").cast("double").alias("val")))
    stats = flat.groupBy("dim").agg(F.min("val").alias("vmin"),
                                    F.max("val").alias("vmax"))
    j = flat.join(F.broadcast(stats), "dim")
    scale = (F.col("vmax") - F.col("vmin")) / F.lit(255.0)
    q = F.round((F.col("val") - F.col("vmin")) / scale, 0)
    deq = F.col("vmin") + q * scale
    sqerr = F.when(F.col("vmax") == F.col("vmin"), F.lit(0.0)) \
             .otherwise((F.col("val") - deq) * (F.col("val") - deq))
    return (j.select("dim", "vmin", "vmax", sqerr.alias("sqerr"))
            .groupBy(F.col("dim").cast("long").alias("dim"))
            .agg(F.min("vmin").alias("vmin"), F.min("vmax").alias("vmax"),
                 F.round(_dec_sum(F.col("sqerr")) / F.count("*"), 12)
                 .alias("mse_q8")))


# --- round 4: embedding QA --------------------------------------------------

@register(
    "embedding_norm_stats",
    oracle=f"""
    WITH n AS (
      SELECT label, {sql_norm('embedding', 64)} AS nrm FROM embeddings
    )
    SELECT CAST(label AS BIGINT) AS label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN nrm = 0.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero_norm,
           ROUND(MIN(nrm), 6) AS min_norm,
           ROUND({_SQL_DEC_SUM.format(x='nrm')} / COUNT(*), 6) AS mean_norm,
           ROUND(MAX(nrm), 6) AS max_norm
    FROM n GROUP BY label
    """,
    tags=("similarity", "vectors", "audit"),
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding QA gate: per-label vector count, ZERO-norm count (the
    failure mode of a broken encoder batch — zero vectors silently poison
    every cosine downstream), and min/mean/max L2 norm. Run before any
    similarity/dedup pass: a norm distribution with outliers means the
    encoder wasn't normalized (cosine vs dot choice becomes load-bearing),
    zero rows mean upstream nulls. Per-row norm is the left-to-right
    fold (bit-identical to the oracle's explicit 64-term chain); the mean
    goes through the decimal-exact sum. One scan, |labels|-group
    aggregate."""
    emb = table(spark, sf_dir, "embeddings")
    n = emb.select(F.col("label").cast("long").alias("label"),
                   norm("embedding", 64).alias("nrm"))
    return (n.groupBy("label")
            .agg(F.count("*").alias("n_vectors"),
                 F.sum(F.when(F.col("nrm") == 0.0, 1).otherwise(0))
                  .cast("long").alias("n_zero_norm"),
                 F.round(F.min("nrm"), 6).alias("min_norm"),
                 F.round(_dec_sum(F.col("nrm")) / F.count("*"), 6)
                  .alias("mean_norm"),
                 F.round(F.max("nrm"), 6).alias("max_norm")))


@register("ann_recall_audit", oracle=None,
          tags=("similarity", "vectors", "ml", "audit"))
def ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible quality row for the approximate ANN tiers: recall@10
    of IVF / PQ / IVF-PQ against the exact brute-force top-10 on the SAME
    fixture query vector. This is the number an ANN rollout is judged by
    (the speed numbers are in bench; this keeps the accuracy side in the
    same per-round artifact). Rows-only: the approximate tiers are
    KMeans/codebook-backed and not SQL-expressible — so the row pins the
    floor itself: each method carries its documented recall floor (the
    tests/test_similarity.py gate values) and a ``meets_floor`` verdict,
    and the operator RAISES when a floor is broken. With seeded
    codebooks/KMeans the whole row set is deterministic, so the driver's
    value-hash is stable round over round for as long as the tiers hold
    their floors — a hash change IS a recall regression."""
    # documented floors (tests/test_similarity.py): IVF probes 2/8 cells on
    # near-uniform vectors (>=0.2); PQ is 32x-compressed near-tie re-rank
    # (>=0.6, measured 0.8); IVF-PQ compounds both prunings (>=0.2)
    floors = {"ivf": 0.2, "pq": 0.6, "ivfpq": 0.2}
    exact = {r[0] for r in ann_bruteforce_topk(spark, sf_dir)
             .select("vec_id").collect()}
    rows = []
    for method, fn in (("ivf", ann_ivf_topk), ("pq", ann_pq_topk),
                       ("ivfpq", ann_ivfpq_topk)):
        got = {r[0] for r in fn(spark, sf_dir).select("vec_id").collect()}
        recall = round(len(got & exact) / max(len(exact), 1), 4)
        ok = recall >= floors[method] or not exact
        if not ok:
            raise AssertionError(
                f"ANN recall floor broken: {method} recall@10 {recall} "
                f"< {floors[method]}")
        rows.append((method, len(got & exact), recall,
                     floors[method], ok))
    return spark.createDataFrame(
        rows, "method string, n_hits_at_10 long, recall_at_10 double, "
              "floor double, meets_floor boolean")
