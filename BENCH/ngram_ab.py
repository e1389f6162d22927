#!/usr/bin/env python3
"""Interleaved A/B for the `dedup_ngram_jaccard` r2→r3 wall-time rise
(VERDICT r3 #4: archived 5.9→8.7 s at sf0.1).

`git diff 07a6a0c..HEAD -- operators/dedup.py` shows the operator's CODE
is identical between the two rounds — only docstrings changed — so
there is no revision pair to A/B; the question reduces to "is the rise
host noise, and where does the time go".  This script answers both in
one session with interleaved reps:

- `full`: the driver-contract query under the same noop-sink action
  bench.py times;
- `cand`: candidate generation only (n-grams → frequency → prefix →
  PPJoin self-join, no verify joins);
- `pref`: the prefix stream only (n-grams → frequency join → groupBy
  prefix derivation, no self-join).

Variants run round-robin (full, cand, pref, full, cand, pref, ...) so a
drifting host hits all variants equally.  Prints one JSON line with
per-variant reps/medians and the derived stage split.

Usage: python3 BENCH/ngram_ab.py [n_rounds]   (default 5)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import universal_parquet_exporter_spark  # noqa: F401  (malloc tuning)
from pyspark.sql import functions as F

from universal_parquet_exporter_spark.operators import dedup
from universal_parquet_exporter_spark.sources.session import build_session, warm_workers

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def _prefix_stream(df, text_col="text", id_col="doc_id", n=3, threshold=0.5):
    """The candidate generator's prefix subplan, stopped before the
    self-join (mirrors jaccard_pairs_prefix's first half)."""
    par = df.sparkSession.sparkContext.defaultParallelism
    g = (
        df.repartition(par, F.col(id_col))
        .select(F.col(id_col).alias("id"), dedup.ngram_hash_set(F.col(text_col), n).alias("ng"))
        .withColumn("nn", F.size("ng"))
        .filter(F.col("nn") > 0)
    )
    ex0 = g.select("id", "nn", F.explode("ng").alias("tok"))
    freq = ex0.groupBy("tok").agg(F.count("*").alias("df_tok"))
    return (
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


def main() -> None:
    n_rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = build_session(app_name="upes-ngram-ab", cpus=CPUS, shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    warm_workers(spark, CPUS)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    docs.count()  # page-cache warm

    def run_noop(df) -> float:
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)

    def cand_only():
        # prefix stream + PPJoin self-join, stopped before the verify
        # joins (the module fn isn't separable there without refactor)
        pref = _prefix_stream(docs)
        a, b = pref.alias("a"), pref.alias("b")
        t = 0.5
        min_overlap_lhs = (
            F.lit(1)
            + F.least(F.col("a.nn") - 1 - F.col("a.pos"), F.col("b.nn") - 1 - F.col("b.pos"))
        ) * F.lit(1.0 + t)
        cond = (
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            & (F.col("b.nn") * F.lit(t) <= F.col("a.nn"))
            & (F.col("a.nn") * F.lit(t) <= F.col("b.nn"))
            & (min_overlap_lhs >= F.lit(t) * (F.col("a.nn") + F.col("b.nn")))
        )
        return (
            a.join(b, cond)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )

    variants = {
        "full": lambda: dedup.q_dedup_ngram_jaccard(spark, SF_DIR),
        "cand": cand_only,
        "pref": lambda: _prefix_stream(docs),
    }

    reps: dict[str, list[float]] = {k: [] for k in variants}
    # warm one pass of each variant (cold first runs measured ~1.5x)
    for k in variants:
        run_noop(variants[k]())
    for _ in range(n_rounds):
        for k in variants:
            reps[k].append(run_noop(variants[k]()))
    out = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "reps": reps,
        "median": {k: round(statistics.median(v), 3) for k, v in reps.items()},
        "spread": {k: [min(v), max(v)] for k, v in reps.items()},
        "verify_share_of_full": round(
            1
            - statistics.median(reps["cand"]) / statistics.median(reps["full"]),
            3,
        ),
        "selfjoin_share_of_cand": round(
            1 - statistics.median(reps["pref"]) / statistics.median(reps["cand"]), 3
        ),
        "code_identity": "git diff 07a6a0c..HEAD -- operators/dedup.py: docstrings only for this operator",
    }
    spark.stop()
    print("ABJSON " + json.dumps(out))


if __name__ == "__main__":
    main()
