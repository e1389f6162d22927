"""Similarity search over embedding columns (``array<float>``).

Three paths, all with **batch NumPy matmul scoring** (Arrow-vectorized,
zero per-row Python) — the idiomatic fast path for dense vector math in
PySpark.  JVM higher-order functions (``zip_with``/``aggregate``) evaluate
one lambda call per array element per pair and were measured 10-50x
slower on this exact workload; every scorer here reshapes candidate
blocks to ``(n, d)`` float64 matrices and runs one BLAS matmul.

- **brute force** (:func:`brute_force_topk`): exact cosine top-k.  The
  (small) query set is captured as a NumPy matrix and shipped to every
  corpus task; each task emits only its local top-k per query (map-side
  combine), so the final exact window runs over ``O(queries * k *
  batches)`` rows, never the corpus.
- **LSH-bucketed** (:func:`srp_buckets`, :func:`q_embed_ann_lsh`): signed
  random projections, hyperplanes drawn deterministically from the corpus
  itself (first ``n_planes`` vectors) so the bucketing is reproducible in
  any engine without shipping constants.  At 100 TB the candidate join
  shuffles on the bucket key only; the quadratic rerank is bounded per
  bucket (sum of bucket squares, never n^2).
- **IVF** (:func:`q_embed_ann_ivf`): fixed deterministic coarse
  centroids, linear assignment, rerank within probed inverted lists.

Raw double sims leave Python; rounding/thresholding happen in Spark
expressions so engine/oracle tie-breaking semantics stay identical.

Oracle-contract caveat: BLAS matmuls sum float products in a different
order than DuckDB's sequential ``list_inner_product`` fold, so a dot
product sitting exactly on a decision boundary (the SRP ``> 0`` sign
bit, or the 4th rounded decimal of a cosine) can flip between engines.
The test fixtures use integer-derived embedding values whose dots stay
far from those boundaries, and the pair kernels pre-filter with a
half-ULP-of-rounding margin; on adversarial near-boundary data the
hash-equality oracle is epsilon-fragile by nature, not wrong.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

PAIR_SCHEMA = "id_a long, id_b long, sim double"
TOPK_SCHEMA = "query_id long, neighbor_id long, sim double"
BUCKET_SCHEMA = "id long, bucket long"
MULTI_BUCKET_SCHEMA = "id long, tbl int, bucket long"
ASSIGN_SCHEMA = "id long, list_id long"


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _list_matrix(col: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Arrow list<float> column -> (n, d) float64 matrix (zero-copy flat
    values, one reshape). Requires fixed-length lists (embedding columns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    n = len(col)
    if n == 0:
        return flat.reshape(0, 0)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    d = int(offs[1] - offs[0])
    return flat[int(offs[0]) : int(offs[0]) + n * d].reshape(n, d)


def _pdf_matrix(series) -> np.ndarray:
    """pandas Series of per-row float arrays -> (n, d) float64 matrix."""
    return np.stack(series.to_numpy()).astype(np.float64, copy=False)


def _collect_matrix(df: DataFrame, id_col: str, vec_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Driver-side collect of a SMALL vector set (queries / hyperplanes /
    centroids — bounded by construction, the broadcast dimension of the
    join) as (ids, matrix), deterministically ordered by id."""
    tbl = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).orderBy("id").toArrow()
    ids = tbl.column("id").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
    return ids, _list_matrix(tbl.column("v"))


def _cosine_block(q_mat: np.ndarray, m: np.ndarray) -> np.ndarray:
    """(nq, n) cosine matrix, double precision: dot / (|a|*|b|) — the same
    formula DuckDB's list_cosine_similarity evaluates."""
    qn = np.sqrt(np.einsum("ij,ij->i", q_mat, q_mat))
    mn = np.sqrt(np.einsum("ij,ij->i", m, m))
    return (q_mat @ m.T) / np.outer(qn, mn)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    The query side is collected into a (nq, d) matrix (small by
    construction) and shipped to every corpus task; each Arrow batch is
    scored with one matmul and contributes its LOCAL top-k per query, so
    the reduce side sees queries*k*batches rows — the map-side-combine
    shape that stays linear in the corpus at 100 TB.  Ties broken by
    ascending neighbor id; rounding happens in Spark at the end."""
    q_ids, q_mat = _collect_matrix(queries, id_col, vec_col)
    kk = int(k)

    def score(iterator):
        for batch in iterator:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            m = _list_matrix(batch.column(1))
            if m.size == 0:
                continue
            sims = _cosine_block(q_mat, m)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(q_ids):
                row = sims[qi]
                keep = ids != qid
                cand_ids = ids[keep]
                cand = row[keep]
                if cand.size == 0:
                    continue
                top = min(kk, cand.size)
                # order: sim desc, id asc (lexsort: last key is primary)
                order = np.lexsort((cand_ids, -cand))[:top]
                out_q.extend([qid] * top)
                out_n.extend(cand_ids[order])
                out_s.extend(cand[order])
            if out_q:
                yield pa.RecordBatch.from_pydict(
                    {
                        "query_id": np.asarray(out_q, np.int64),
                        "neighbor_id": np.asarray(out_n, np.int64),
                        "sim": np.asarray(out_s, np.float64),
                    }
                )

    local = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    ).mapInArrow(score, TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rk", F.row_number().over(w))
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
    """Signed-random-projection bucket id per vector — one narrow
    mapInArrow pass (matmul against the (n_planes, d) hyperplane matrix,
    sign bits weighted 2^plane), no join and no shuffle.  ``planes``
    supplies the hyperplanes (any deterministic small set of vectors)."""
    p = planes.select(F.col(id_col).alias("plane_id"), F.col(vec_col).alias("pv")).filter(
        F.col("plane_id") < n_planes
    )
    _, p_mat = _collect_matrix(p, "plane_id", "pv")
    weights = (2 ** np.arange(p_mat.shape[0], dtype=np.int64)).astype(np.int64)

    def bucketize(iterator):
        for batch in iterator:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            m = _list_matrix(batch.column(1))
            if m.size == 0:
                continue
            bits = (m @ p_mat.T) > 0
            buckets = bits @ weights
            yield pa.RecordBatch.from_pydict({"id": ids, "bucket": buckets.astype(np.int64)})

    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).mapInArrow(
        bucketize, BUCKET_SCHEMA
    )


def srp_buckets_multi(
    df: DataFrame,
    planes: DataFrame,
    n_tables: int = 4,
    planes_per_table: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table SRP bucketing: ``n_tables`` independent hash tables of
    ``planes_per_table`` hyperplanes each — the standard LSH recall
    lever (a single table splits ~half of all true near-neighbor pairs
    per plane; with L tables a pair is a candidate if it collides in ANY
    table, so the miss probability decays exponentially in L —
    measured here: recall@1 0.05 with one 6-plane table vs >=0.9 with
    4x3, `tests/test_ann_recall.py`).  Emits (id, tbl, bucket); one
    matmul against all ``n_tables*planes_per_table`` hyperplanes, rows
    exploded n_tables-fold — still one narrow no-shuffle pass."""
    n_planes = n_tables * planes_per_table
    p = planes.select(F.col(id_col).alias("plane_id"), F.col(vec_col).alias("pv")).filter(
        F.col("plane_id") < n_planes
    )
    _, p_mat = _collect_matrix(p, "plane_id", "pv")
    weights = (2 ** np.arange(planes_per_table, dtype=np.int64)).astype(np.int64)

    def bucketize(iterator):
        for batch in iterator:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            m = _list_matrix(batch.column(1))
            if m.size == 0:
                continue
            bits = (m @ p_mat.T) > 0  # (n, n_planes), plane t*ppt+j -> table t bit j
            out_id = np.repeat(ids, n_tables)
            out_tbl = np.tile(np.arange(n_tables, dtype=np.int32), len(ids))
            bucket_cols = [
                bits[:, t * planes_per_table : (t + 1) * planes_per_table] @ weights
                for t in range(n_tables)
            ]
            out_bucket = np.stack(bucket_cols, axis=1).reshape(-1)
            yield pa.RecordBatch.from_pydict(
                {"id": out_id, "tbl": out_tbl, "bucket": out_bucket.astype(np.int64)}
            )

    return df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")).mapInArrow(
        bucketize, MULTI_BUCKET_SCHEMA
    )


def _bucket_pairs_kernel(threshold: float):
    """applyInPandas kernel: all qualifying (id_a < id_b, raw sim >=
    threshold-eps) pairs within one bucket, scored by one matmul."""

    def kernel(pdf):
        import pandas as pd

        ids = pdf["id"].to_numpy().astype(np.int64, copy=False)
        order = np.argsort(ids)
        ids = ids[order]
        m = _pdf_matrix(pdf["v"].iloc[order])
        sims = _cosine_block(m, m)
        iu, ju = np.triu_indices(len(ids), k=1)
        s = sims[iu, ju]
        # pre-filter must keep every raw sim that could ROUND UP to the
        # threshold (final exact filter is round(sim,4) >= threshold in
        # Spark): widen by half the rounding granularity (5e-5)
        keep = s >= threshold - 5e-5 - 1e-9
        return pd.DataFrame(
            {"id_a": ids[iu[keep]], "id_b": ids[ju[keep]], "sim": s[keep]}
        )

    return kernel


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b) with ``a < b`` and
    ``round(cosine, 4) >= threshold``.

    ``n_planes = 0`` is the exact all-pairs baseline — quadratic, for
    modest corpora (single-group matmul).  ``n_planes > 0`` is the scale
    path: SRP-LSH blocking (:func:`srp_buckets`, hyperplanes = the first
    ``n_planes`` corpus vectors, deterministic in any engine) turns the
    O(n^2) search into a bucket-grouped rerank — sum of per-bucket
    squares; the only shuffle is on the bucket key.  Pairs split across
    buckets are the (bounded, standard) LSH recall tradeoff."""
    v = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if n_planes > 0:
        buckets = srp_buckets(df, planes=df, n_planes=n_planes, id_col=id_col, vec_col=vec_col)
        grouped = v.join(buckets, "id")
    else:
        grouped = v.withColumn("bucket", F.lit(0))
    pairs = grouped.groupBy("bucket").applyInPandas(
        _bucket_pairs_kernel(threshold), PAIR_SCHEMA
    )
    return (
        pairs.withColumn("sim", F.round("sim", 4))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def _bucket_topk_kernel(k: int):
    """applyInPandas kernel: per query row (is_q=1) in the group, local
    top-k among member rows (is_q=0), self excluded — one matmul per
    group.  Shared by the LSH and IVF rerank stages."""

    def kernel(pdf):
        import pandas as pd

        is_q = pdf["is_q"].to_numpy().astype(bool)
        ids = pdf["id"].to_numpy().astype(np.int64, copy=False)
        q_ids = ids[is_q]
        c_ids = ids[~is_q]
        if q_ids.size == 0 or c_ids.size == 0:
            return pd.DataFrame({"query_id": [], "neighbor_id": [], "sim": []}).astype(
                {"query_id": np.int64, "neighbor_id": np.int64, "sim": np.float64}
            )
        q_mat = _pdf_matrix(pdf["v"].iloc[is_q])
        c_mat = _pdf_matrix(pdf["v"].iloc[~is_q])
        sims = _cosine_block(q_mat, c_mat)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(q_ids):
            keep = c_ids != qid
            cand_ids = c_ids[keep]
            cand = sims[qi][keep]
            if cand.size == 0:
                continue
            top = min(k, cand.size)
            order = np.lexsort((cand_ids, -cand))[:top]
            out_q.extend([qid] * top)
            out_n.extend(cand_ids[order])
            out_s.extend(cand[order])
        return pd.DataFrame(
            {
                "query_id": np.asarray(out_q, np.int64),
                "neighbor_id": np.asarray(out_n, np.int64),
                "sim": np.asarray(out_s, np.float64),
            }
        )

    return kernel


def ivf_assign(
    vectors: DataFrame,
    centroids_ids: np.ndarray,
    centroids_mat: np.ndarray,
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids by cosine
    (ties broken by ascending centroid id) — one mapInArrow matmul pass
    against the fixed (small) centroid matrix, no join, no shuffle.  The
    output is (id, list_id), the inverted lists of an IVF index; at scale
    the downstream candidate join shuffles on ``list_id`` only."""
    npb = int(nprobe)
    c_ids = centroids_ids

    def assign(iterator):
        for batch in iterator:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            m = _list_matrix(batch.column(1))
            if m.size == 0:
                continue
            sims = _cosine_block(m, centroids_mat)  # (n, n_cent)
            if npb == 1:
                # argmax picks the first (= lowest cid, ids are sorted) max
                best = np.argmax(sims, axis=1)
                yield pa.RecordBatch.from_pydict(
                    {"id": ids, "list_id": c_ids[best].astype(np.int64)}
                )
            else:
                out_i, out_l = [], []
                for ri in range(sims.shape[0]):
                    order = np.lexsort((c_ids, -sims[ri]))[:npb]
                    out_i.extend([ids[ri]] * len(order))
                    out_l.extend(c_ids[order])
                yield pa.RecordBatch.from_pydict(
                    {
                        "id": np.asarray(out_i, np.int64),
                        "list_id": np.asarray(out_l, np.int64),
                    }
                )

    return vectors.mapInArrow(assign, ASSIGN_SCHEMA)


def q_embed_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a FIXED number of deterministic coarse centroids
    (the first 20 vectors — corpus-size-independent, so assignment cost
    stays linear in n), single-probe inverted-list assignment for the
    corpus, 2-probe for the queries, exact cosine rerank within the
    probed lists (bucket-grouped matmul).  The scale path of
    :func:`q_embed_topk` where recall matters more than LSH's speed."""
    emb = _t(spark, sf_dir, "embeddings")
    vecs = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v"))
    c_ids, c_mat = _collect_matrix(emb.filter(F.col("vec_id") < 20), "vec_id", "embedding")
    members = vecs.join(ivf_assign(vecs, c_ids, c_mat, nprobe=1), "id").withColumn(
        "is_q", F.lit(0)
    )
    probes = (
        vecs.filter(F.col("id") < 20)
        .join(ivf_assign(vecs.filter(F.col("id") < 20), c_ids, c_mat, nprobe=2), "id")
        .withColumn("is_q", F.lit(1))
    )
    local = (
        members.unionByName(probes)
        .withColumnRenamed("list_id", "bucket")
        .groupBy("bucket")
        .applyInPandas(_bucket_topk_kernel(1), TOPK_SCHEMA)
    )
    # a query probes 2 lists -> up to 2 local winners; exact global top-1
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )


def q_embed_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH (signed-random-projection) ANN: top-1 neighbor per query among
    candidates that collide in ANY of 8 independent 3-plane hash tables
    (:func:`srp_buckets_multi` — one 6-plane table recalled only 0.05 of
    exact top-1 neighbors; 8x3 measures 0.95, `tests/test_ann_recall.py`).
    Scale path of :func:`q_embed_topk` — the only shuffle is on
    (table, bucket), and the rerank is a per-bucket matmul; a candidate
    pair colliding in several tables just yields duplicate local winners
    that the final exact top-1 window collapses."""
    emb = _t(spark, sf_dir, "embeddings")
    buckets = srp_buckets_multi(emb, planes=emb, n_tables=8, planes_per_table=3)
    vecs = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("v")).join(
        buckets, "id"
    )
    tagged = vecs.withColumn("is_q", F.when(F.col("id") < 20, F.lit(1)).otherwise(F.lit(0)))
    # queries are corpus members too: emit them once as member (is_q=0)
    # and once as query (is_q=1); the kernel excludes self-pairs
    both = vecs.withColumn("is_q", F.lit(0)).unionByName(
        tagged.filter(F.col("is_q") == 1)
    )
    local = both.groupBy("tbl", "bucket").applyInPandas(_bucket_topk_kernel(1), TOPK_SCHEMA)
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        local.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"))
    )
