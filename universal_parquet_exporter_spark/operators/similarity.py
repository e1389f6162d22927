"""Similarity search over embedding columns (``array<float>``).

Two paths:

- **brute force** (:func:`brute_force_topk`): exact cosine top-k via a
  broadcast of the (small) query set against the corpus — one narrow map
  over the corpus + a per-query top-k aggregate.  The dot products are
  JVM-side (`zip_with`/`aggregate` in double precision) — no Python.
- **LSH-bucketed** (:func:`srp_buckets`, :func:`q_embed_ann_lsh`): signed
  random projections, with the hyperplanes drawn deterministically from
  the corpus itself (first ``n_planes`` vectors) so the bucketing is
  reproducible in any engine without shipping constants.  At 100 TB the
  candidate join shuffles on the bucket key only.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
    )


def cosine_sim(a, b):
    """Cosine similarity between two array<float> columns, in double."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query side is broadcast (small by construction); ties broken by
    ascending neighbor id so results are deterministic."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_sim(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), F.col("rk").alias("rank"))
    )


def q_embed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-1 cosine neighbor for the first 20 vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    return brute_force_topk(queries, emb, k=1).select("query_id", "neighbor_id", "sim")


def srp_buckets(
    df: DataFrame,
    planes: DataFrame,
    n_planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Signed-random-projection bucket id per vector.  ``planes`` supplies
    the hyperplanes (any deterministic small set of vectors)."""
    p = planes.select(F.col(id_col).alias("plane_id"), F.col(vec_col).alias("pv")).filter(
        F.col("plane_id") < n_planes
    )
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    signed = (
        v.crossJoin(F.broadcast(p))
        .withColumn("bit", F.when(_dot(F.col("v"), F.col("pv")) > 0, F.lit(1)).otherwise(F.lit(0)))
        .groupBy("id")
        .agg(F.sum(F.col("bit") * F.pow(F.lit(2.0), F.col("plane_id")).cast("long")).alias("bucket"))
    )
    return signed


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with ``a < b`` and
    ``round(cosine, 4) >= threshold``.

    ``n_planes = 0`` is the exact all-pairs baseline (small side
    broadcast into a nested-loop join) — quadratic, for modest corpora.
    ``n_planes > 0`` is the scale path: SRP-LSH blocking
    (:func:`srp_buckets`, hyperplanes = the first ``n_planes`` corpus
    vectors, deterministic in any engine) turns the O(n^2) search into a
    bucket-equi-join — sum of per-bucket squares — then the exact cosine
    rerank runs only within buckets.  Same exact kernel, narrowed
    candidates; pairs split across buckets are the (bounded, standard)
    LSH recall tradeoff."""
    if n_planes > 0:
        buckets = srp_buckets(df, planes=df, n_planes=n_planes, id_col=id_col, vec_col=vec_col)
        v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).join(buckets, "id")
        a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), F.col("bucket").alias("ba"))
        b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), F.col("bucket").alias("bb"))
        pairs = a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
    else:
        a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        pairs = F.broadcast(a).join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("sim", F.round(cosine_sim(F.col("va"), F.col("vb")), 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "id",
    vec_col: str = "v",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine
    (ties broken by ascending centroid id).  ``centroids`` is small by
    construction and broadcast; the output is (id, list_id) — the inverted
    lists of an IVF index.  At scale the downstream candidate join
    shuffles on ``list_id`` only."""
    c = centroids.select(F.col("cid"), F.col("cv"))
    scored = (
        vectors.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(F.broadcast(c))
        .withColumn("csim", cosine_sim(F.col("v"), F.col("cv")))
    )
    if nprobe == 1:
        # single-probe: a plain max_by aggregation, no window shuffle
        return scored.groupBy("id").agg(
            F.max(F.struct(F.col("csim"), (-F.col("cid")).alias("ncid"))).alias("m")
        ).select("id", (-F.col("m.ncid")).alias("list_id"))
    w = Window.partitionBy("id").orderBy(F.desc("csim"), F.asc("cid"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= nprobe)
        .select("id", F.col("cid").alias("list_id"))
    )


def q_embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a FIXED number of deterministic coarse centroids
    (the first 20 vectors — corpus-size-independent, so assignment cost
    stays linear in n), single-probe inverted-list assignment for the
    corpus, 2-probe for the queries, exact cosine rerank within the
    probed lists.  The scale path of :func:`q_embed_topk` where recall
    matters more than LSH's speed."""
    emb = _t(spark, sf_dir, "embeddings")
    vecs = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    cent = vecs.filter(F.col("id") < 20).select(
        F.col("id").alias("cid"), F.col("v").alias("cv")
    )
    lists = ivf_assign(vecs, cent, nprobe=1)
    probes = ivf_assign(vecs.filter(F.col("id") < 20), cent, nprobe=2).withColumnRenamed(
        "id", "query_id"
    )
    cand = probes.join(lists, "list_id").filter(F.col("id") != F.col("query_id"))
    scored = (
        cand.join(vecs.select(F.col("id").alias("query_id"), F.col("v").alias("qv")), "query_id")
        .join(vecs.select(F.col("id").alias("neighbor_id"), F.col("v").alias("cv2")), F.col("id") == F.col("neighbor_id"))
        .withColumn("sim", cosine_sim(F.col("qv"), F.col("cv2")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def q_embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH (signed-random-projection) ANN: top-1 neighbor per query among
    same-bucket candidates.  Scale path of :func:`q_embed_topk` — the join
    is on bucket ids, not all-pairs."""
    emb = _t(spark, sf_dir, "embeddings")
    buckets = srp_buckets(emb, planes=emb, n_planes=6)
    vecs = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")).join(
        buckets, "id"
    )
    q = vecs.filter(F.col("id") < 20).select(
        F.col("id").alias("query_id"), F.col("v").alias("qv"), F.col("bucket").alias("qb")
    )
    c = vecs.select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv"), F.col("bucket").alias("cb")
    )
    scored = (
        F.broadcast(q)
        .join(c, (F.col("qb") == F.col("cb")) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("sim", cosine_sim(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )
