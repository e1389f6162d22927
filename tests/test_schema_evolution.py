"""Additive schema evolution: appends may add or omit columns; decode
resolves the union-by-name schema from meta-only probes, null-padding
the generations that predate a column — and type flips fail loudly, at
write time through the guarded sink and at read time through the union
probe."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from universal_parquet_exporter_spark.encode.pipeline import (
    EncodeJobConfig,
    decode_dataset,
    encode_job,
    load_or_build_plan,
)
from universal_parquet_exporter_spark.sources import spark_datasource as sds

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def evolved(spark, tmp_path):
    """Generation 1: (doc_id, text, lang, source, n_chars) for doc_id <
    '25'.  Generation 2: source DROPPED, score ADDED, for doc_id >= '25'.
    Returns (out_dir, old_df, new_df)."""
    out = str(tmp_path / "evo")
    df = _docs(spark)
    old = df.where("doc_id < '25'")
    new = (
        df.where("doc_id >= '25'")
        .drop("source")
        .withColumn("score", F.col("n_chars").cast("double") / 10.0)
    )
    load_or_build_plan(df, EncodeJobConfig(output_dir=out, key_col="doc_id", size_cols=("text",)))
    sds.register(spark)
    old.write.format("upe_encoded").option("key_col", "doc_id").mode("append").save(out)
    new.write.format("upe_encoded").option("key_col", "doc_id").mode("append").save(out)
    return out, old, new


def test_decode_unions_generations_with_nulls(spark, evolved):
    out, old, new = evolved
    dec = decode_dataset(spark, out)
    assert set(dec.columns) == {"doc_id", "text", "lang", "source", "n_chars", "score"}
    expected = old.withColumn("score", F.lit(None).cast("double")).unionByName(
        new.withColumn("source", F.lit(None).cast("string"))
    )
    assert _rows(dec.select(*sorted(dec.columns))) == _rows(
        expected.select(*sorted(dec.columns))
    )


def test_decode_pruned_to_added_column(spark, evolved):
    out, old, new = evolved
    dec = decode_dataset(spark, out, columns=["doc_id", "score"])
    assert dec.columns == ["doc_id", "score"]
    assert dec.where("score IS NULL").count() == old.count()
    assert dec.where("score IS NOT NULL").count() == new.count()


def test_datasource_reads_union_and_filters_on_added_column(spark, evolved):
    out, old, new = evolved
    r = spark.read.format("upe_encoded").load(out)
    assert set(r.columns) == {"doc_id", "text", "lang", "source", "n_chars", "score"}
    got = r.where(F.col("score") >= 20.0).select("doc_id", "score")
    exp = new.where(F.col("score") >= 20.0).select("doc_id", "score")
    assert _rows(got) == _rows(exp)


def test_zone_map_filter_on_added_column_is_exact(spark, evolved):
    out, old, new = evolved
    dec = decode_dataset(spark, out, filters=[("score", ">=", 20.0)])
    exp = new.where(F.col("score") >= 20.0)
    assert dec.count() == exp.count()


def test_writer_rejects_type_flip(spark, evolved):
    out, _old, _new = evolved
    bad = _docs(spark).limit(3).withColumn("n_chars", F.col("n_chars").cast("string"))
    with pytest.raises(Exception, match="type conflict"):
        bad.write.format("upe_encoded").option("key_col", "doc_id").mode("append").save(out)


def test_decode_fails_loudly_on_conflicting_generations(spark, tmp_path):
    """The unguarded function API can write a type flip; the union probe
    must refuse to decode it rather than silently cast."""
    out = str(tmp_path / "conflict")
    df = _docs(spark).limit(20)
    encode_job(
        spark,
        df,
        EncodeJobConfig(output_dir=out, key_col="doc_id", size_cols=("text",)),
    )
    flipped = df.withColumn("n_chars", F.col("n_chars").cast("double"))
    encode_job(
        spark,
        flipped,
        EncodeJobConfig(
            output_dir=out, key_col="doc_id", size_cols=("text",), skip_completed=False
        ),
    )
    # same column-name set -> the union probe sees one generation; the
    # conflict surfaces in the decode task's per-chunk type check
    with pytest.raises(Exception, match="schema conflict"):
        decode_dataset(spark, out).collect()
