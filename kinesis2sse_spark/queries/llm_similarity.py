"""Similarity search over ``embeddings.embedding`` (array<float>, 64-dim):
brute-force cosine top-k (exact baseline, oracle-checked), random-projection
LSH (approximate), and IVF (cluster-probe) — the three rungs of the ANN
ladder for a 100 TB corpus.

Determinism: ranking is always on (round(cos, 6) DESC, vec_id) so FP
summation-order noise below 1e-6 can't reorder results between Spark and
the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kinesis2sse_spark.catalog import load_table
from kinesis2sse_spark.registry import register

N_QUERIES = 10  # query set = vec_id < 10
TOP_K = 5


def _with_norm(e):
    v = F.transform("embedding", lambda x: x.cast("double"))
    return e.select("vec_id", v.alias("v")).withColumn(
        "norm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    )


@register(
    "sim_topk_bruteforce",
    bench=True,
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    )
    SELECT query_id, neighbor_id, cos_sim
    FROM (
      SELECT query_id, neighbor_id, cos_sim,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ) WHERE rn <= {TOP_K}
    """,
)
def sim_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, compute dot/norms with JVM higher-order functions, keep the
    per-query top-k with a window. The corpus is scanned once and never
    shuffled — only (n_queries × corpus) scores flow into the top-k,
    which WindowGroupLimit prunes map-side."""
    e = load_table(spark, sf_dir, "embeddings")
    corpus = _with_norm(e)
    queries = corpus.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = (
        corpus.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot / (F.col("qnorm") * F.col("norm")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


@register("sim_topk_lsh", oracle=None)
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH: bucket vectors by the sign pattern of
    projections onto fixed pseudo-random hyperplanes (derived from a
    hash, so fully deterministic), then rerank exactly within the
    query's bucket. The scale path — candidate generation is an
    equi-join on bucket id. Approximate → rows-only check."""
    n_planes = 6
    e = load_table(spark, sf_dir, "embeddings")
    corpus = _with_norm(e)

    # hyperplane component h[p][d] in [-1, 1), derived from xxhash64 —
    # no RNG, same plan every run
    def bucket_bits(vcol):
        bits = []
        for p in range(n_planes):
            proj = F.aggregate(
                F.zip_with(
                    vcol,
                    F.transform(
                        F.sequence(F.lit(0), F.size(vcol) - 1),
                        lambda d: (
                            F.pmod(F.xxhash64(F.lit(p), d), F.lit(2000)) - 1000
                        ).cast("double")
                        / 1000.0,
                    ),
                    lambda x, h: x * h,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            bits.append(F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    bucketed = corpus.withColumn("bucket", bucket_bits(F.col("v")))
    queries = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        "bucket",
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = (
        bucketed.join(F.broadcast(queries), "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot / (F.col("qnorm") * F.col("norm")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


@register("sim_topk_ivf", oracle=None)
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF (inverted-file) ANN: KMeans-partition the corpus, then probe
    only the 2 centroids nearest each query and rerank exactly inside
    those cells. At 100 TB the corpus is written partitioned by cell id,
    so a probe reads ~2/k of the data. Approximate → rows-only check."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    k = 16
    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).withColumn("features", array_to_vector("v"))
    km = KMeans(k=k, seed=42, featuresCol="features", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select(
        "vec_id",
        "v",
        "cell",
        F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x)).alias("norm"),
    )

    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, cv array<double>",
    )
    queries = assigned.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("norm").alias("qnorm")
    )
    qdot = F.aggregate(
        F.zip_with("qv", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    # 2 nearest centroids per query (by cosine against centroid)
    wq = Window.partitionBy("query_id").orderBy(F.col("cdist").desc(), "cell")
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .withColumn("cdist", qdot)
        .withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select("query_id", "qv", "qnorm", "cell")
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(dot / (F.col("qnorm") * F.col("norm")), 6).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TOP_K)
        .drop("rn")
    )


@register(
    "sim_knn_classify",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label,
             round(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
      FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < {N_QUERIES}
    ),
    top AS (
      SELECT query_id, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos_sim DESC, neighbor_id) AS rn
      FROM scored
    ),
    votes AS (
      SELECT query_id, label, count(*) AS votes
      FROM top WHERE rn <= {TOP_K}
      GROUP BY query_id, label
    )
    SELECT query_id, label AS predicted_label, votes
    FROM (
      SELECT query_id, label, votes,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY votes DESC, label) AS vr
      FROM votes
    ) WHERE vr = 1
    ORDER BY query_id
    """,
)
def sim_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label voting over the embedding corpus: exact top-k neighbor
    search (same broadcast + WindowGroupLimit plan as
    sim_topk_bruteforce — corpus scanned once, never shuffled), then a
    majority vote over neighbor labels with a deterministic tiebreak
    (most votes, then smallest label). The training-pipeline use: label
    propagation / quality-bucket inference for unlabeled corpora. At
    100 TB the query set stays broadcast-sized and the vote is a
    per-query aggregate over k rows — the corpus-side cost is identical
    to one brute-force scan, or sub-linear via the LSH/IVF rungs."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    corpus = e.select("vec_id", "label", v.alias("v")).withColumn(
        "norm", F.sqrt(F.aggregate("v", F.lit(0.0), lambda a, x: a + x * x))
    )
    queries = _with_norm(e).filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    dot = F.aggregate(
        F.zip_with("qv", "v", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = corpus.join(F.broadcast(queries), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.round(dot / (F.col("qnorm") * F.col("norm")), 6).alias("cos_sim"),
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    votes = (
        scored.withColumn("rn", F.row_number().over(wk))
        .filter(F.col("rn") <= TOP_K)
        .groupBy("query_id", "label")
        .agg(F.count("*").alias("votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), "label")
    return (
        votes.withColumn("vr", F.row_number().over(wv))
        .filter(F.col("vr") == 1)
        .select("query_id", F.col("label").alias("predicted_label"), "votes")
        .orderBy("query_id")
    )


N_SEEDS = 8  # k-means cells: seed centroids = vec_id < 8


@register(
    "ml_kmeans_assign",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cell, v AS cv FROM corpus WHERE vec_id < {N_SEEDS}
    ),
    scored AS (
      SELECT c.vec_id, s.cell,
             round(list_cosine_similarity(c.v, s.cv), 6) AS cos_sim
      FROM corpus c CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, cell, cos_sim,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, cell) AS rn
      FROM scored
    )
    SELECT cell, count(*) AS n_members, round(avg(cos_sim), 6) AS avg_cos
    FROM best WHERE rn = 1
    GROUP BY cell
    ORDER BY cell
    """,
)
def ml_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One k-means assignment step with deterministic seed centroids
    (vec_id < N_SEEDS): every vector joins the broadcast centroid set,
    takes its nearest cell by cosine (tiebreak: smallest cell), and the
    per-cell membership count + mean similarity come out of one
    aggregate. This is the per-iteration heavy half of Lloyd's
    algorithm at scale — centroids broadcast (k × dim doubles), the
    corpus scans once with no shuffle before the k-row aggregate, so
    the plan is identical at 100 TB with 1000 executors. The update
    half is the same groupBy producing element-wise means (see
    sim_topk_ivf for the full Spark ML KMeans path)."""
    corpus = _with_norm(load_table(spark, sf_dir, "embeddings"))
    seeds = corpus.filter(F.col("vec_id") < N_SEEDS).select(
        F.col("vec_id").alias("cell"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = corpus.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "cell",
        F.round(dot / (F.col("norm") * F.col("cnorm")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), "cell")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("cell")
        .agg(
            F.count("*").alias("n_members"),
            F.round(F.avg("cos_sim"), 6).alias("avg_cos"),
        )
        .orderBy("cell")
    )


@register(
    "ml_kmeans_update",
    oracle=f"""
    WITH corpus AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ),
    seeds AS (
      SELECT vec_id AS cell, v AS cv FROM corpus WHERE vec_id < {N_SEEDS}
    ),
    scored AS (
      SELECT c.vec_id, s.cell,
             round(list_cosine_similarity(c.v, s.cv), 6) AS cos_sim
      FROM corpus c CROSS JOIN seeds s
    ),
    best AS (
      SELECT vec_id, cell,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos_sim DESC, cell) AS rn
      FROM scored
    ),
    members AS (
      SELECT b.cell, c.v FROM best b JOIN corpus c USING (vec_id)
      WHERE b.rn = 1
    )
    SELECT cell, dim, round(avg(comp), 6) AS centroid_comp
    FROM (
      SELECT cell, unnest(v) AS comp,
             generate_subscripts(v, 1) AS dim
      FROM members
    )
    GROUP BY cell, dim
    ORDER BY cell, dim
    """,
)
def ml_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The centroid-update half of a Lloyd iteration: element-wise mean
    of every member vector per cell, emitted as (cell, dim,
    centroid_comp) rows. posexplode flattens vectors to components, but
    the groupBy(cell, dim) aggregate partial-aggregates map-side, so
    the shuffle carries at most k × dim × partitions partial sums —
    never the exploded corpus. Paired with ml_kmeans_assign this is a
    full distributed k-means step whose only corpus-sized costs are one
    scan and zero shuffles before the tiny aggregates."""
    corpus = _with_norm(load_table(spark, sf_dir, "embeddings"))
    seeds = corpus.filter(F.col("vec_id") < N_SEEDS).select(
        F.col("vec_id").alias("cell"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    dot = F.aggregate(
        F.zip_with("v", "cv", lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
    )
    scored = corpus.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "v",
        "cell",
        F.round(dot / (F.col("norm") * F.col("cnorm")), 6).alias("cos_sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos_sim").desc(), "cell")
    members = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("cell", "v")
    )
    return (
        members.select("cell", F.posexplode("v").alias("pos", "comp"))
        .groupBy("cell", (F.col("pos") + 1).cast("bigint").alias("dim"))
        .agg(F.round(F.avg("comp"), 6).alias("centroid_comp"))
        .orderBy("cell", "dim")
    )
