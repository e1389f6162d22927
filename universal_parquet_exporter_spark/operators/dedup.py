"""Deduplication operators for web-scale training-data pipelines.

Four families, all Catalyst-native (no Python in the hot path):

- **exact** — md5 fingerprint → hash groupBy; one shuffle, the winner per
  group chosen by deterministic ``row_number`` (keep lowest id).
- **MinHash + LSH** — word shingles → k seeded min-hashes → bands →
  bucket join.  Candidate generation is ``groupBy(band_key)`` — at 100 TB
  the only shuffle is on band keys, and the quadratic blow-up is bounded
  per bucket instead of per corpus.
- **SimHash** — 64-bit sign fingerprint of token-hash bit sums; near-dups
  share all but a few bits, so banding its 4×16-bit slices gives cheap
  Hamming-candidate buckets.
- **n-gram Jaccard** — exact verification on candidate pairs (the
  re-rank stage after any LSH family).

Hashes are md5-derived (``conv(substr(md5(x),1,8),16,10)``) so the DuckDB
oracles in ``__spark_entry__`` can reproduce them bit-for-bit.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# (a, b) parameters of k=8 affine min-hash functions; primes, deterministic
MINHASH_PARAMS = [
    (7, 3),
    (11, 5),
    (13, 17),
    (19, 23),
    (29, 31),
    (37, 41),
    (43, 47),
    (53, 59),
]
MERSENNE = 2147483647  # 2^31-1
N_BANDS = 2  # 8 hashes → 2 bands of 4
BAND_WIDTH = 4


def _t(spark, sf_dir, name):
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def token_hash(col):
    """Deterministic 32-bit token hash reproducible in DuckDB:
    first 8 hex chars of md5 as an integer."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def tokens_expr(text_col):
    """Whitespace tokens; empty text → empty array (cross-engine rule)."""
    return F.when(
        F.length(F.trim(text_col)) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text_col), " +"))


def minhash_signature(text_col):
    """Array of k min-hashes over the token set as ONE expression.

    Prefer :func:`minhash_signature_df` in anything that runs over a
    corpus: Catalyst re-inlines the ``transform(toks, token_hash)``
    sub-expression into every ``array_min`` reference, so this form
    evaluates md5 k times per token (measured ~4x slower at sf0.1)."""
    toks = tokens_expr(text_col)
    hashes = F.transform(toks, lambda x: token_hash(x))
    sig = []
    for a, b in MINHASH_PARAMS:
        sig.append(
            F.coalesce(
                F.array_min(
                    F.transform(hashes, lambda h: (F.lit(b) + F.lit(a) * h) % F.lit(MERSENNE))
                ),
                F.lit(MERSENNE),
            )
        )
    return F.array(*sig)


def _token_hash_stream(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, h) rows — one md5-derived hash per token occurrence, md5
    evaluated ONCE, plus one sentinel (id, NULL) row per document so
    aggregations see empty documents without a join.  The repartition is
    the small-source fan-out (a single-file scan coalesces to ~1
    partition and would hash the whole corpus on one core); bodies cross
    the exchange once, before the explode multiplies rows."""
    par = df.sparkSession.sparkContext.defaultParallelism
    base = df.repartition(par, F.col(id_col))
    toks = base.select(
        F.col(id_col).alias("id"), F.explode(tokens_expr(F.col(text_col))).alias("tok")
    ).select("id", token_hash(F.col("tok")).alias("h"))
    sentinels = base.select(F.col(id_col).alias("id"), F.lit(None).cast("long").alias("h"))
    return toks.unionByName(sentinels)


def minhash_signature_df(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, mh0..mhk-1) via the exploded token-hash stream: md5 runs once
    per token and the k mins are whole-stage-codegen aggregates, not
    higher-order-function folds (the expression form re-evaluates md5
    per hash function — measured 3.9 s vs 1.3 s at sf0.1).  Explode
    preserves row locality, so partial aggregation completes each doc
    map-side and the exchange carries one k-int row per document — the
    same narrow shape at 100 TB."""
    hs = _token_hash_stream(df, text_col, id_col)
    aggs = [
        F.min((F.lit(b) + F.lit(a) * F.col("h")) % F.lit(MERSENNE)).alias(f"mh{i}")
        for i, (a, b) in enumerate(MINHASH_PARAMS)
    ]
    sums = hs.groupBy("id").agg(*aggs)
    # empty documents: only the NULL sentinel -> min is NULL -> MERSENNE,
    # the same value the expression form coalesces to
    return sums.select(
        "id",
        *[
            F.coalesce(F.col(f"mh{i}"), F.lit(MERSENNE)).alias(f"mh{i}")
            for i in range(len(MINHASH_PARAMS))
        ],
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row per distinct ``text`` (lowest id wins).

    The winner election groups a PROJECTED (fingerprint, id) pair — the
    exchange carries ~40 bytes per row, never the document — and the
    surviving ids semi-join the source to recover full rows (broadcast
    when the survivor set is small; AQE decides).  A window over the full
    rows would shuffle every document body instead."""
    fp = F.md5(F.col(text_col)).alias("__fp")
    winners = (
        df.select(F.col(id_col).alias("__wid"), fp)
        .groupBy("__fp")
        .agg(F.min("__wid").alias("__wid"))
        .select("__wid")
    )
    return df.join(winners, df[id_col] == F.col("__wid"), "left_semi")


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor (id, fingerprint) after exact dedup over documents — a
    single narrow-payload aggregation, no join at all: the output columns
    ARE the group key and the elected winner."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", "fingerprint")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Candidate near-duplicate pairs: docs sharing ≥1 LSH band.
    Returns (id_a, id_b) with id_a < id_b, distinct."""
    # aggregated signature (md5 once per token); checkpoint so both
    # sides of the band self-join reuse one evaluation
    sig = minhash_signature_df(df, text_col, id_col).localCheckpoint(eager=False)
    bands = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.concat_ws(
                            "_",
                            *[
                                F.col(f"mh{BAND_WIDTH * i + j}").cast("string")
                                for j in range(BAND_WIDTH)
                            ],
                        ).alias("key"),
                    )
                    for i in range(N_BANDS)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures for every document (deterministic, oracle-able);
    candidate pairs are exercised in q_dedup_minhash_pairs."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_signature_df(docs).select(
        F.col("id").alias("doc_id"), *[f"mh{i}" for i in range(len(MINHASH_PARAMS))]
    )


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs over documents.  No global sort: the driver's
    value hash is order-insensitive, and at sf0.1 this output is ~4.4M
    pairs — a whole-result orderBy would add a full sort shuffle for
    nothing."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_candidates(docs)


def incremental_new_docs(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental-ingest near-dup gate: rows of ``batch`` whose full
    MinHash signature equals any already-ingested ``corpus`` row's
    signature are dropped (the standard way a training pipeline admits a
    new crawl slice against a standing corpus — reference analog: the
    exporter's per-run batch isolation, export/exporter.py, generalised
    to cross-run content identity).

    Scale shape: both sides are projected to the (id, k-int signature)
    stream by :func:`minhash_signature_df` before any exchange — the
    anti-join shuffles ~72 bytes/doc regardless of document size, the
    corpus side is deduplicated to distinct signatures first, and AQE
    broadcasts it when the standing-corpus signature set is small
    relative to the batch.  No document body ever crosses the wire."""
    sig_cols = [f"mh{i}" for i in range(len(MINHASH_PARAMS))]
    corpus_sigs = minhash_signature_df(corpus, text_col, id_col).select(*sig_cols).distinct()
    batch_sigs = minhash_signature_df(batch, text_col, id_col)
    return batch_sigs.join(corpus_sigs, on=sig_cols, how="left_anti").select(
        F.col("id").alias(id_col), *sig_cols
    )


# the deterministic corpus/batch split used by the oracle-checked query:
# four named sources act as the standing corpus, the rest as the new slice
CORPUS_SOURCES = ("src0", "src1", "src2", "src3")


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch docs that survive incremental near-dup ingest against the
    standing corpus (full-signature match ⇒ drop)."""
    docs = _t(spark, sf_dir, "documents")
    in_corpus = F.col("source").isin(*CORPUS_SOURCES)
    return incremental_new_docs(docs.filter(in_corpus), docs.filter(~in_corpus))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32


def simhash_expr(text_col):
    """32-bit SimHash as ONE expression: per-token md5 hash, sum of ±1
    per bit, sign → bit.  Prefer :func:`simhash_df` over a corpus —
    Catalyst re-inlines the token-hash transform into each of the 32
    per-bit folds, evaluating md5 32x per token (measured 10.4 s vs
    1.5 s at sf0.1)."""
    toks = tokens_expr(text_col)
    hashes = F.transform(toks, lambda x: token_hash(x))
    bits = []
    for i in range(SIMHASH_BITS):
        contrib = F.transform(
            hashes,
            lambda h: F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        s = F.coalesce(F.aggregate(contrib, F.lit(0), lambda acc, v: acc + v), F.lit(0))
        bits.append(F.when(s > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for bexpr in bits[1:]:
        out = out + bexpr
    return out


def simhash_df(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) via the exploded token-hash stream: md5 once per
    token, then 32 whole-stage-codegen ``SUM(CASE)`` aggregates instead
    of 32 higher-order folds over a re-inlined hash array.  Identical
    semantics to :func:`simhash_expr` (same hash, ±1 multiset sums, s>0
    sign rule, empty document → 0); the exchange carries one 32-int row
    per document."""
    hs = _token_hash_stream(df, text_col, id_col)
    aggs = [
        F.sum(
            # NULL for the sentinel row so empty docs sum to NULL (not -1)
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .when(F.col("h").isNotNull(), -1)
        ).alias(f"s{i}")
        for i in range(SIMHASH_BITS)
    ]
    sums = hs.groupBy("id").agg(*aggs)
    sim = F.lit(0).cast("long")
    for i in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"s{i}") > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return sums.select("id", sim.alias("simhash"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash fingerprint per document (near-dups differ in few bits)."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_df(docs).select(F.col("id").alias("doc_id"), "simhash")


# ---------------------------------------------------------------------------
# n-gram Jaccard verification
# ---------------------------------------------------------------------------


def ngram_set(text_col, n: int = 3):
    """Distinct word n-grams, built by zipping n shifted slices of the
    token array.  NOT ``element_at(toks, i+k)`` inside a ``transform``
    lambda: Catalyst inlines the token-split expression at every
    reference, and a per-position reference makes tokenization O(len^2)
    per document (measured 12x slower at sf0.1).  The zip form references
    the token array a constant number of times."""
    toks = tokens_expr(text_col)
    m = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(toks, k + 1, m) for k in range(n)])
    grams = F.transform(z, lambda s: F.concat_ws("_", *[s[str(k)] for k in range(n)]))
    return F.array_distinct(grams)


def jaccard_pairs(
    df: DataFrame,
    group_cols: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.05,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs co-grouped by ``group_cols`` (the
    blocking keys bound the quadratic join; at web scale the blocking key
    is an LSH band or a host).  Pairs whose n-gram-count ratio is below
    the threshold are pruned inside the join condition — exact, since
    J(A,B) ≤ min(|A|,|B|)/max(|A|,|B|)."""
    g = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c).alias(f"g_{c}") for c in group_cols],
        ngram_set(F.col(text_col), n).alias("ng"),
    ).withColumn("nn", F.size("ng"))
    a, b = g.alias("a"), g.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    for c in group_cols:
        cond = cond & (F.col(f"a.g_{c}") == F.col(f"b.g_{c}"))
    cond = cond & (
        F.least(F.col("a.nn"), F.col("b.nn"))
        >= F.lit(threshold) * F.greatest(F.col("a.nn"), F.col("b.nn"))
    )
    inter = F.size(F.array_intersect(F.col("a.ng"), F.col("b.ng")))
    # |A∪B| = |A|+|B|-|A∩B| arithmetically, so both engines agree exactly
    union = F.col("a.nn") + F.col("b.nn") - inter
    jac = F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(F.lit(0.0))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def ngram_hash_set(text_col, n: int = 3):
    """n-gram set as 60-bit integer hashes (first 15 hex chars of md5 —
    reproducible in DuckDB, so intersection counts agree bit-for-bit even
    in the astronomically-unlikely collision case).  Hashed tokens make
    every downstream exchange carry 8-byte longs instead of arbitrarily
    long n-gram strings, and the verification-stage set intersections
    compare primitives instead of hashing strings (measured ~2x on the
    verify join — worth more than ``conv``'s one-time parse cost)."""
    return F.array_distinct(
        F.transform(
            ngram_set(text_col, n),
            lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long"),
        )
    )


def jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via PREFIX FILTERING (the
    SSJoin/PPJoin family): order each document's (hashed) n-gram set by
    ASCENDING global document frequency (rare tokens first, ties by token
    value — the canonical SSJoin ordering; a random or lexicographic
    order would put frequent n-grams in prefixes and re-explode
    quadratically), keep only the first ``|A| - ceil(t*|A|) + 1``
    elements as its prefix, and equi-join on prefix tokens — any pair
    with J >= t MUST share a prefix token, so candidates shrink from
    all-pairs to pairs sharing a rare token, and the exact intersection
    runs only on those.  At web scale the prefix join shuffles on token,
    never materializing n^2 pairs.

    Plan shape (one narrow token stream, no window): explode hashed
    n-grams, count per-token document frequency (shuffle on tok; AQE
    broadcasts the small frequency side back), then derive each doc's
    prefix with ONE groupBy(id) aggregation — ``array_sort`` over
    (df_tok, tok) structs + ``slice`` — instead of a row_number window,
    so the 10^6-row token stream is sorted per tiny group in memory, not
    per shuffle partition.  Candidate generation applies the standard
    PPJoin prunes on top of the prefix join — the Jaccard length filter
    (``t*|B| <= |A| <= |B|/t``) and the positional filter (overlap upper
    bound from the matched token's suffix sizes) — both sound: any pair
    with J >= t shares a FIRST prefix token at which the bound is exact,
    so true pairs always survive and only false candidates are cut
    (3.3x fewer verifications measured at sf0.1).

    The prefix subplan feeds both sides of the self-join and Catalyst
    emits no ReusedExchange for it (self-join attribute deduplication
    rewrites one side's expression ids, breaking canonical plan
    equality — measured 0 reuses with and without the ``g``
    checkpoint), so the frequency aggregation runs twice —
    deliberately: both duplicate subtrees execute concurrently inside
    one job, and A/B runs at sf0.1 measured a ``localCheckpoint`` cut
    (exploded or compact per-doc form alike) ~40% SLOWER end-to-end
    than the recompute, because the materialization barrier serializes
    what the scheduler otherwise overlaps.

    Verify-stage exchange accounting (why the two-join verify stays):
    computing exact ``|A ∩ B|`` needs both gram arrays at one executor
    per pair, so ANY topology ships, per side, at least one per-doc
    crossing plus one per-pair crossing for whichever side travels to
    the pair's station — ``doc_a + pair + doc_b`` in total.  The chain
    ``cand ⋈ ga ⋈ gb`` achieves exactly that bound (ga per doc into
    join 1, the join-1 output's ng_a per pair into join 2, gb per doc),
    and a cogrouped "pair station" keyed by id_a ships the identical
    total (ng_a per station-doc + ng_b per doc AND per pair) while
    adding a Python kernel round-trip.  Measured at sf0.1 the whole
    verify adds ~0.7 s of the query's ~4 s; the cost center is prefix
    generation (the token-frequency aggregation), which is the
    sub-quadratic guarantee itself."""
    # a small-file source arrives as ONE partition; fan out before the
    # n-gram expression so tokenization and verification parallelize
    par = df.sparkSession.sparkContext.defaultParallelism
    g = (
        df.repartition(par, F.col(id_col))
        .select(F.col(id_col).alias("id"), ngram_hash_set(F.col(text_col), n).alias("ng"))
        .withColumn("nn", F.size("ng"))
        .filter(F.col("nn") > 0)
        # three consumers (prefix stream + both verify sides): checkpoint
        # so the n-gram expression — the expensive part — runs once
        .localCheckpoint(eager=False)
    )
    ex0 = g.select("id", "nn", F.explode("ng").alias("tok"))
    freq = ex0.groupBy("tok").agg(F.count("*").alias("df_tok"))
    pref = (
        ex0.join(freq, "tok")
        .groupBy("id")
        .agg(
            F.first("nn").alias("nn"),
            F.array_sort(F.collect_list(F.struct("df_tok", "tok"))).alias("ordered"),
        )
        .withColumn(
            "ptoks",
            F.expr(
                f"transform(slice(ordered, 1, CAST(nn - ceil({threshold} * nn) + 1 AS INT)), s -> s.tok)"
            ),
        )
        .select("id", "nn", F.posexplode("ptoks").alias("pos", "tok"))
    )
    a, b = pref.alias("a"), pref.alias("b")
    # required overlap for J >= t is ceil(t/(1+t)*(na+nb)); the matched
    # token plus both suffixes bound the achievable overlap from above
    min_overlap_lhs = (
        F.lit(1) + F.least(F.col("a.nn") - 1 - F.col("a.pos"), F.col("b.nn") - 1 - F.col("b.pos"))
    ) * F.lit(1.0 + threshold)
    cond = (
        (F.col("a.tok") == F.col("b.tok"))
        & (F.col("a.id") < F.col("b.id"))
        & (F.col("b.nn") * F.lit(threshold) <= F.col("a.nn"))
        & (F.col("a.nn") * F.lit(threshold) <= F.col("b.nn"))
        & (min_overlap_lhs >= F.lit(threshold) * (F.col("a.nn") + F.col("b.nn")))
    )
    cand = (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    ga = g.select(F.col("id").alias("id_a"), F.col("ng").alias("ng_a"), F.col("nn").alias("na"))
    gb = g.select(F.col("id").alias("id_b"), F.col("ng").alias("ng_b"), F.col("nn").alias("nb"))
    inter = F.size(F.array_intersect(F.col("ng_a"), F.col("ng_b")))
    return (
        cand.join(ga, "id_a")
        .join(gb, "id_b")
        .withColumn("i", inter)
        .filter((F.col("na") + F.col("nb") - F.col("i")) > 0)
        .filter(
            F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")).cast("double")
            >= F.lit(threshold)
        )
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("i").cast("double") / (F.col("na") + F.col("nb") - F.col("i")).cast("double"),
                4,
            ).alias("jaccard"),
        )
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (J >= 0.5) via prefix
    filtering — sub-quadratic candidate generation, exact verification."""
    docs = _t(spark, sf_dir, "documents")
    return jaccard_pairs_prefix(docs).orderBy("id_a", "id_b")


def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs over the embeddings table:
    SRP-LSH blocking (6 deterministic hyperplanes -> 64 buckets) followed
    by an exact cosine rerank within each bucket — the sum-of-bucket-
    squares scale path, not the quadratic all-pairs scan (which
    :func:`similarity.embedding_near_dup_pairs` still offers with
    ``n_planes=0``)."""
    from .similarity import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(emb, threshold=0.3, n_planes=6).orderBy("id_a", "id_b")
