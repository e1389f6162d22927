"""Compaction: fragmented units re-packed into full-size chunks behind
the versioned-manifest pointer swap — values bit-identical, fragments
actually merged, in-flight (uncommitted) rows preserved, superseded
bytes reclaimable by the next vacuum."""

import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from universal_parquet_exporter_spark.encode.compaction import compact
from universal_parquet_exporter_spark.encode.maintenance import vacuum
from universal_parquet_exporter_spark.encode.pipeline import (
    EncodeJobConfig,
    decode_dataset,
    encode_job,
    manifest_dir,
)

pytestmark = pytest.mark.usefixtures("spark")


def _docs(spark):
    return spark.read.parquet(os.path.join(SF_SMOKE, "documents.parquet")).withColumn(
        "doc_id", F.col("doc_id").cast("string")
    )


def _ingest_fragmented(spark, out, n_batches=4, chunk_rows=64):
    """n_batches small appends -> every unit holds many tiny slices."""
    df = _docs(spark)
    for i in range(n_batches):
        part = df.where(F.crc32(F.col("doc_id")) % n_batches == i)
        cfg = EncodeJobConfig(
            output_dir=out,
            key_col="doc_id",
            size_cols=("text",),
            target_unit_bytes=256 << 10,
            chunk_rows=chunk_rows,
            skip_completed=False,
            batch_tag=f"append_{i}",
        )
        encode_job(spark, part, cfg)
    return df


def _committed_slices(spark, out):
    man = spark.read.parquet(manifest_dir(out))
    ok = (
        spark.read.parquet(os.path.join(out, "lineage"))
        .where("status = 'ok'")
        .select("unit", "run_id")
    )
    return man.join(ok, ["unit", "run_id"], "left_semi")


def test_compact_merges_and_preserves_values(spark, tmp_path):
    out = str(tmp_path / "cmp")
    df = _ingest_fragmented(spark, out)
    before = _committed_slices(spark, out)
    n_before = before.count()
    avg_before = before.agg(F.avg("n_rows")).collect()[0][0]

    rep = compact(spark, out, chunk_rows=32768)
    assert rep["units_compacted"] > 0
    assert rep["manifest_rewritten"]
    assert 0 < rep["slices_after"] < rep["slices_before"]
    assert manifest_dir(out).endswith("data_v1")

    after = _committed_slices(spark, out)
    assert after.count() < n_before
    assert after.agg(F.avg("n_rows")).collect()[0][0] > avg_before

    got = sorted(tuple(r) for r in decode_dataset(spark, out).collect())
    exp = sorted(tuple(r) for r in df.collect())
    assert got == exp


def test_compact_noop_on_healthy_dataset(spark, tmp_path):
    out = str(tmp_path / "healthy")
    df = _docs(spark)
    encode_job(
        spark,
        df,
        EncodeJobConfig(output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=4 << 20),
    )
    rep = compact(spark, out, chunk_rows=64)  # every slice >= 64/2 rows
    assert rep["units_compacted"] == 0
    assert not rep["manifest_rewritten"]
    assert manifest_dir(out).endswith("data")


def test_compact_dry_run_changes_nothing(spark, tmp_path):
    out = str(tmp_path / "dry")
    df = _ingest_fragmented(spark, out, n_batches=2)
    rep = compact(spark, out, dry_run=True)
    assert rep["units_compacted"] > 0 and not rep["manifest_rewritten"]
    assert manifest_dir(out).endswith("data")
    got = sorted(tuple(r) for r in decode_dataset(spark, out).collect())
    assert got == sorted(tuple(r) for r in df.collect())


def test_compact_preserves_inflight_uncommitted_rows(spark, tmp_path):
    """A run that committed its manifest but not yet its lineage (crash
    window / in-flight job) must survive the rewrite: dropping its rows
    would lose the data it is about to commit."""
    out = str(tmp_path / "inflight")
    _ingest_fragmented(spark, out, n_batches=2)
    data_dir = manifest_dir(out)
    man = spark.read.parquet(data_dir)
    inflight = man.limit(3).withColumn("run_id", F.lit("inflight-run"))
    inflight.select(*man.columns).write.mode("append").parquet(data_dir)
    n_inflight = (
        spark.read.parquet(data_dir).where(F.col("run_id") == "inflight-run").count()
    )
    assert n_inflight > 0

    compact(spark, out)
    new_man = spark.read.parquet(manifest_dir(out))
    assert new_man.where(F.col("run_id") == "inflight-run").count() == n_inflight


def test_vacuum_reclaims_superseded_payload(spark, tmp_path):
    """After compaction, chunks referenced ONLY by the compacted units'
    old manifest rows are dead; the next vacuum sweeps them."""
    out = str(tmp_path / "reclaim")
    df = _ingest_fragmented(spark, out)
    compact(spark, out)
    rep = vacuum(spark, out)
    assert rep["deleted_files"] > 0
    assert rep["reclaimed_bytes"] > 0
    got = sorted(tuple(r) for r in decode_dataset(spark, out).collect())
    assert got == sorted(tuple(r) for r in df.collect())


def test_compact_requires_plan(spark, tmp_path):
    with pytest.raises(ValueError, match="plan.json"):
        compact(spark, str(tmp_path / "nope"))


def test_compact_evolved_dataset_preserves_union(spark, tmp_path):
    """Schema evolution × compaction: a fragmented unit holding chunks
    from TWO generations (one with ``source``, one with ``score``)
    re-packs into shared chunks — the rewrite pads each decoded chunk to
    the generations' union schema, so the decoded union (typed nulls for
    absent-column rows) is identical before and after the rewrite."""
    from universal_parquet_exporter_spark.encode.pipeline import load_or_build_plan

    out = str(tmp_path / "evocmp")
    df = _docs(spark)
    old = df.where("doc_id < '25'")
    new = (
        df.where("doc_id >= '25'")
        .drop("source")
        .withColumn("score", F.col("n_chars").cast("double") / 10.0)
    )
    load_or_build_plan(
        df,
        EncodeJobConfig(
            output_dir=out, key_col="doc_id", size_cols=("text",), target_unit_bytes=256 << 10
        ),
    )
    for i, part in enumerate(
        [
            old.where(F.crc32(F.col("doc_id")) % 2 == 0),
            new.where(F.crc32(F.col("doc_id")) % 2 == 0),
            old.where(F.crc32(F.col("doc_id")) % 2 == 1),
            new.where(F.crc32(F.col("doc_id")) % 2 == 1),
        ]
    ):
        encode_job(
            spark,
            part,
            EncodeJobConfig(
                output_dir=out,
                key_col="doc_id",
                size_cols=("text",),
                chunk_rows=64,
                skip_completed=False,
                batch_tag=f"gen_{i}",
            ),
        )

    expected = old.withColumn("score", F.lit(None).cast("double")).unionByName(
        new.withColumn("source", F.lit(None).cast("string"))
    )
    cols = sorted(expected.columns)
    before = sorted(tuple(r) for r in decode_dataset(spark, out).select(*cols).collect())
    assert before == sorted(tuple(r) for r in expected.select(*cols).collect())

    rep = compact(spark, out, chunk_rows=32768)
    assert rep["units_compacted"] > 0
    assert rep["slices_after"] < rep["slices_before"]
    after = sorted(tuple(r) for r in decode_dataset(spark, out).select(*cols).collect())
    assert after == before


def test_compact_skips_crashed_overwrite_version_dir(spark, tmp_path):
    """Version allocation scans EXISTING data_v* dirs: a leftover
    data_v3 from a crashed (or in-flight) DataSource overwrite must not
    be clobbered — compact targets data_v4 and leaves v3 untouched."""
    out = str(tmp_path / "cmpver")
    df = _ingest_fragmented(spark, out)
    stray = os.path.join(out, "data_v3")
    os.makedirs(stray)
    marker = os.path.join(stray, "in-flight-writer.parquet")
    open(marker, "w").write("not ours")

    rep = compact(spark, out, chunk_rows=32768)
    assert rep["manifest_rewritten"]
    assert manifest_dir(out).endswith("data_v4")
    assert open(marker).read() == "not ours"  # stray dir untouched
    got = {r.doc_id for r in decode_dataset(spark, out).select("doc_id").collect()}
    assert got == {r.doc_id for r in df.select("doc_id").collect()}


def test_compact_cluster_by_retroclusters(spark, tmp_path):
    """``compact(cluster_by=...)`` = Iceberg's sort-strategy
    rewrite_data_files: a dataset ingested in interleaved order gains
    narrow per-chunk zone maps on the cluster columns retroactively —
    values still bit-identical, and an equality decode over the
    rewritten manifest prunes chunks it could not prune before."""
    import json

    out = str(tmp_path / "cmp_cluster")
    df = _ingest_fragmented(spark, out)

    def dv_singletons(slices):
        rows = slices.select(
            F.get_json_object("stats", "$._dv.lang").alias("dv")
        ).collect()
        if not rows:
            return 0.0
        return sum(
            1 for r in rows if r.dv is not None and len(json.loads(r.dv)) == 1
        ) / len(rows)

    before = dv_singletons(_committed_slices(spark, out))

    rep = compact(
        spark, out, chunk_rows=8, min_avg_slice_rows=1 << 30, cluster_by=("lang",)
    )
    assert rep["units_compacted"] > 0 and rep["manifest_rewritten"]

    after = dv_singletons(_committed_slices(spark, out))
    assert after > before
    assert after > 0.5

    # bit-identity survives the re-sort
    dec = decode_dataset(spark, out)
    assert sorted(map(tuple, dec.collect())) == sorted(map(tuple, df.collect()))
    # and the equality filter now prunes
    ev = {}
    got = decode_dataset(spark, out, filters=[("lang", "=", "de")], pruning_evidence=ev)
    assert got.count() == df.where(F.col("lang") == "de").count()
    assert ev["qualifying"] < ev["total"]


def test_compact_cluster_by_unknown_column_fails(spark, tmp_path):
    out = str(tmp_path / "cmp_cluster_bad")
    _ingest_fragmented(spark, out, n_batches=2)
    with pytest.raises(ValueError, match="cluster_by"):
        compact(spark, out, chunk_rows=64, cluster_by=("nope",))
