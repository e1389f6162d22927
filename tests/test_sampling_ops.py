"""Behavioral contracts for the training-mix sampler, the incremental
ingest gate, and the repetition scorer — the semantics the oracles
can't see (stability across partitionings, known near-dup drops,
extreme-value behavior)."""

import pytest
from pyspark.sql import functions as F

from universal_parquet_exporter_spark.operators import dedup, sampling, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_stratified_sample_stable_across_partitionings(spark):
    rows = [(i, f"doc {i} words", "en" if i % 3 else "de") for i in range(200)]
    df = _docs(spark, rows)
    base = {r.doc_id for r in sampling.stratified_sample(df, "lang").collect()}
    shuffled = {
        r.doc_id
        for r in sampling.stratified_sample(df.repartition(7, "text"), "lang").collect()
    }
    assert base == shuffled
    assert 0 < len(base) < len(rows)


def test_stratified_sample_rates_bind_per_stratum(spark):
    rows = [(i, f"w{i}", "en") for i in range(100)] + [
        (1000 + i, f"w{i}", "xx") for i in range(100)
    ]
    df = _docs(spark, rows)
    out = sampling.stratified_sample(df, "lang", rates={"en": 0}).collect()
    langs = {r.lang for r in out}
    assert langs == {"xx"}  # rate 0 drops the stratum entirely, default keeps all
    assert len(out) == 100


def test_incremental_gate_drops_signature_matches(spark):
    corpus = _docs(spark, [(1, "alpha beta gamma delta", "en")])
    batch = _docs(
        spark,
        [
            (10, "alpha beta gamma delta", "en"),  # exact dup -> same signature
            (11, "completely different words here entirely", "en"),
        ],
    )
    out = dedup.incremental_new_docs(corpus, batch)
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [11]


def test_incremental_gate_empty_corpus_keeps_batch(spark):
    corpus = _docs(spark, []).filter(F.lit(False))
    batch = _docs(spark, [(5, "some words", "en"), (6, "other words", "en")])
    out = dedup.incremental_new_docs(corpus, batch)
    assert sorted(r.doc_id for r in out.collect()) == [5, 6]


@pytest.mark.parametrize(
    "text,n,dw,db,flag",
    [
        ("spam spam spam spam spam", 5, 0.8, 0.75, 1),  # degenerate repetition
        ("one two three four five", 5, 0.0, 0.0, 0),  # all distinct
        ("", 0, 0.0, 0.0, 0),  # empty doc
        ("word", 1, 0.0, 0.0, 0),  # single token: no bigrams
    ],
)
def test_repetition_extremes(spark, text, n, dw, db, flag):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    ncol, dwcol, dbcol = textstats.repetition_exprs(F.col("text"))
    row = df.select(
        ncol.alias("n"),
        F.round(dwcol, 4).alias("dw"),
        F.round(dbcol, 4).alias("db"),
        F.when((dwcol > 0.6) | (dbcol > 0.1), 1).otherwise(0).alias("flag"),
    ).collect()[0]
    assert (row.n, row.dw, row.db, row.flag) == (n, dw, db, flag)
