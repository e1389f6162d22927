"""Zone maps over timestamp/date/decimal columns + scale-safe unit
pruning + codec provenance (round-5 surface).

The reference's only range diagnostic is ``MIN/MAX(order_date)``
(/root/reference/examples/advanced_integration_example.py:168-169); the
north rule's input schema makes ``warc_ts`` the canonical range-filter
column, so timestamp bounds must prune (VERDICT r4 next-round #2).
"""

import json
import os
from datetime import date, datetime, timedelta
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pytest

from universal_parquet_exporter_spark.encode.pipeline import (
    EncodeJobConfig,
    _chunk_stats,
    _units_condition,
    completed_units,
    date_value_days,
    decode_dataset,
    encode_job,
    manifest_dir,
    ts_value_us,
    unit_id_ranges,
)


@pytest.fixture()
def outdir(tmp_path):
    return str(tmp_path / "enc")


def _typed_df(spark, n=600):
    """Deterministic table with timestamp/date/decimal columns, keys
    zero-padded so lexicographic unit order == id order (clustered)."""
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.lpad(F.col("id").cast("string"), 6, "0").alias("k"),
            F.timestamp_micros(
                F.lit(1704067200000000) + F.col("id") * 3600_000_000
            ).alias("ts"),  # 2024-01-01 + id hours
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias("d"),
            (F.col("id").cast("decimal(12,2)") * Decimal("1.25")).cast(
                "decimal(12,2)"
            ).alias("price"),
            F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("text"),
        )
    )


# ---------------------------------------------------------------------------
# _chunk_stats typed bounds
# ---------------------------------------------------------------------------


def test_chunk_stats_records_typed_bounds():
    tbl = pa.table(
        {
            "ts": pa.array(
                [datetime(2024, 1, 1), datetime(2024, 1, 3), None], pa.timestamp("us")
            ),
            "d": pa.array([date(2024, 1, 5), date(2024, 2, 1), None], pa.date32()),
            "price": pa.array(
                [Decimal("1.25"), Decimal("99999999.99"), None], pa.decimal128(12, 2)
            ),
            "body": pa.array(["x" * 500, "y" * 500, "z" * 500]),  # long strings skip
        }
    )
    stats = json.loads(_chunk_stats(tbl))
    assert stats["ts"] == [ts_value_us(datetime(2024, 1, 1)), ts_value_us(datetime(2024, 1, 3))]
    assert stats["d"] == [date_value_days(date(2024, 1, 5)), date_value_days(date(2024, 2, 1))]
    # decimals as exact strings: unscaled ints can overflow int64 at p38
    assert stats["price"] == ["1.25", "99999999.99"]
    assert "body" not in stats


def test_chunk_stats_ns_timestamps_normalize_to_us():
    tbl = pa.table(
        {"ts": pa.array([datetime(2024, 6, 1, 12, 0, 0)], pa.timestamp("ns"))}
    )
    stats = json.loads(_chunk_stats(tbl))
    assert stats["ts"][0] == ts_value_us(datetime(2024, 6, 1, 12, 0, 0))


# ---------------------------------------------------------------------------
# filtered decode with typed bounds (prunes AND stays exact)
# ---------------------------------------------------------------------------


def _qualifying(spark, outdir, col, lo_us=None, hi_us=None):
    """Chunks whose recorded [min,max] can intersect [lo,hi] — ONE
    aggregation row, no manifest collect."""
    from pyspark.sql import functions as F

    mn = F.get_json_object(F.col("stats"), f"$.{col}[0]").cast("long")
    mx = F.get_json_object(F.col("stats"), f"$.{col}[1]").cast("long")
    cond = F.lit(True)
    if lo_us is not None:
        cond = cond & (mx.isNull() | (mx >= lo_us))
    if hi_us is not None:
        cond = cond & (mn.isNull() | (mn <= hi_us))
    row = (
        spark.read.parquet(manifest_dir(outdir))
        .agg(F.count("*").alias("total"), F.sum(cond.cast("long")).alias("q"))
        .collect()[0]
    )
    return int(row.q), int(row.total)


def test_timestamp_filter_prunes_and_is_exact(spark, outdir):
    df = _typed_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    lo = datetime(2024, 1, 5)
    hi = datetime(2024, 1, 10)
    q, total = _qualifying(spark, outdir, "ts", ts_value_us(lo), ts_value_us(hi))
    assert total > 1 and q < total, f"ts zone maps pruned nothing ({q}/{total})"

    dec = decode_dataset(spark, outdir, filters=[("ts", ">=", lo), ("ts", "<=", hi)])
    got = sorted(r.k for r in dec.collect())
    exp = sorted(r.k for r in df.where((df.ts >= lo) & (df.ts <= hi)).collect())
    assert got == exp and len(got) > 0


def test_date_and_decimal_filters_exact(spark, outdir):
    df = _typed_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)

    d_lo = date(2024, 3, 1)
    dec1 = decode_dataset(spark, outdir, filters=[("d", ">=", d_lo)])
    exp1 = df.where(df.d >= d_lo.isoformat()).count()
    assert dec1.count() == exp1 > 0

    p_hi = Decimal("100.00")
    dec2 = decode_dataset(spark, outdir, filters=[("price", "<=", p_hi)])
    exp2 = df.where(df.price <= p_hi).count()
    assert dec2.count() == exp2 > 0
    # decimal values round-trip exactly through the filter path
    got = {r.price for r in dec2.collect()}
    exp = {r.price for r in df.where(df.price <= p_hi).collect()}
    assert got == exp


# ---------------------------------------------------------------------------
# scale-safe unit pruning: O(ranges) literals, identical bytes
# ---------------------------------------------------------------------------


def test_unit_id_ranges_collapse():
    assert unit_id_ranges([]) == []
    assert unit_id_ranges([7]) == [(7, 7)]
    assert unit_id_ranges([3, 4, 5, 9, 10, 12]) == [(3, 5), (9, 10), (12, 12)]
    # unsorted + duplicated input collapses the same way
    assert unit_id_ranges([5, 3, 4, 4, 12, 10, 9]) == [(3, 5), (9, 10), (12, 12)]
    # the common case — units_for_key_range returns one contiguous span
    assert unit_id_ranges(range(100, 1100)) == [(100, 1099)]


def test_units_condition_is_o_ranges_not_o_units(spark):
    # a contiguous million-unit span must compile to ONE BETWEEN, not a
    # million-literal isin (the 100 TB metadata-plane fix)
    cond = _units_condition(range(1_000_000))
    s = str(cond)
    assert s.count("1000000") <= 1 and len(s) < 200
    df = spark.range(5).selectExpr("id as unit")
    assert df.where(_units_condition([1, 2, 4])).count() == 3
    assert df.where(_units_condition([])).count() == 0


def test_key_range_decode_unchanged_by_range_predicate(spark, outdir):
    df = _typed_df(spark, n=400)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    dec = decode_dataset(spark, outdir, key_range=("000100", "000250"))
    got = sorted(r.k for r in dec.collect())
    assert got == [f"{i:06d}" for i in range(100, 251)]


def test_completed_units_is_sorted_int64_array(spark, outdir):
    df = _typed_df(spark, n=300)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",), target_unit_bytes=8 << 10
    )
    encode_job(spark, df, cfg)
    done = completed_units(spark, outdir)
    assert isinstance(done, np.ndarray) and done.dtype == np.int64
    assert (np.sort(done) == done).all() and done.size > 0


# ---------------------------------------------------------------------------
# codec provenance: lineage carries native (C fast path) per unit
# ---------------------------------------------------------------------------


def test_lineage_carries_native_provenance(spark, outdir):
    df = _typed_df(spark, n=200)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",), target_unit_bytes=64 << 10
    )
    encode_job(spark, df, cfg)
    lin = spark.read.parquet(os.path.join(outdir, "lineage"))
    assert "native" in lin.columns
    vals = {r.native for r in lin.select("native").collect()}
    # this host has gcc, so the fast path loads in every worker
    assert vals == {True}


def test_encode_stream_records_fallback_provenance(monkeypatch, tmp_path):
    """With the C kernels disabled (the no-compiler worker), fragments
    carry native=False — a heterogeneous cluster's mixed paths are
    attributable from metadata alone."""
    monkeypatch.setenv("UPES_DISABLE_NATIVE", "1")
    from universal_parquet_exporter_spark.encode.pipeline import _encode_stream
    from universal_parquet_exporter_spark.plans.partitioning import EncodePlan

    plan = EncodePlan(key_col="k", boundaries=[], salts=[1])
    tbl = pa.table({"k": [f"{i:04d}" for i in range(50)], "v": list(range(50))})
    frags = list(
        _encode_stream(
            iter(tbl.to_batches()),
            plan,
            np.array([], dtype=np.int64),
            "k",
            str(tmp_path / "payload"),
        )
    )
    assert frags and all(x is False for x in frags[0].column("native").to_pylist())


def test_in_list_filter_prunes_and_is_exact(spark, outdir):
    df = _typed_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    wanted = ["000010", "000011", "000500"]
    dec = decode_dataset(spark, outdir, filters=[("k", "in", wanted)])
    assert sorted(r.k for r in dec.collect()) == ["000010", "000011", "000500"]
    # IN on a timestamp column converts each listed value to epoch-µs
    ts_vals = [datetime(2024, 1, 1, 5), datetime(2024, 1, 1, 9)]  # ids 5, 9
    dec2 = decode_dataset(spark, outdir, filters=[("ts", "in", ts_vals)])
    assert sorted(r.k for r in dec2.collect()) == ["000005", "000009"]
    with pytest.raises(ValueError, match="empty IN-list"):
        decode_dataset(spark, outdir, filters=[("k", "in", [])])


# ---------------------------------------------------------------------------
# distinct-value sets: exact equality pruning where bounds never exclude
# ---------------------------------------------------------------------------


def _dv_df(spark, n=600):
    """Keys clustered (zero-padded) with a CATEGORICAL column whose value
    is interleaved within every chunk: min/max bounds on `cat` span the
    whole alphabet in every chunk, so only the distinct-value set can
    prune an equality term."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.lpad(F.col("id").cast("string"), 6, "0").alias("k"),
        F.element_at(
            F.array(F.lit("ar"), F.lit("de"), F.lit("en"), F.lit("fr"), F.lit("zh")),
            (F.col("id") % 5 + 1).cast("int"),
        ).alias("cat"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("text"),
    )


def test_chunk_stats_records_distinct_sets():
    t = pa.table(
        {
            "k": pa.array([str(i) for i in range(200)]),
            "cat": pa.array(["de", "en", "fr", "ja"] * 50),
            "score": pa.array([float(i) for i in range(200)]),
            "ts": pa.array(
                [datetime(2024, 1, 1, i % 3) for i in range(200)], pa.timestamp("us")
            ),
            "price": pa.array([Decimal("1.50"), Decimal("2.75")] * 100, pa.decimal128(12, 2)),
        }
    )
    s = json.loads(_chunk_stats(t))
    assert s["_dv"]["cat"] == ["de", "en", "fr", "ja"]  # sorted, exact
    assert "score" not in s["_dv"]  # floats record no sets
    assert s["_dv"]["ts"] == sorted(
        ts_value_us(datetime(2024, 1, 1, h)) for h in (0, 1, 2)
    )  # zone-map domain: epoch-µs ints
    assert s["_dv"]["price"] == ["1.50", "2.75"]  # exact decimal strings
    assert "k" not in s["_dv"]  # 200 distinct > cap
    assert s["cat"] == ["de", "ja"]  # bounds unchanged beside the sets


def test_chunk_stats_dv_guards():
    # long-string members: the whole set is dropped, never truncated
    long = "x" * 100
    t = pa.table({"c": pa.array([long, "short"] * 10)})
    s = json.loads(_chunk_stats(t))
    assert "_dv" not in s
    # a REAL column named _dv: no set map is emitted, and no bounds
    # under the reserved key — readers can never misparse
    t2 = pa.table({"_dv": pa.array([1, 2, 3]), "cat": pa.array(["a", "b", "c"])})
    s2 = json.loads(_chunk_stats(t2))
    assert "_dv" not in s2 and s2["cat"] == ["a", "c"]


def test_dv_equality_prunes_where_bounds_cannot(spark, outdir):
    """'es' sits strictly inside every chunk's [ar..zh] cat bounds but
    occurs in no row: bounds keep every chunk, the distinct sets prune
    every chunk — the interleaved-categorical case this feature exists
    for — while a PRESENT value stays exact."""
    from pyspark.sql import functions as F

    df = _dv_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)

    # manifest evidence: one aggregation row, no manifest collect
    dvj = F.get_json_object(F.col("stats"), "$._dv.cat")
    member = F.array_contains(F.from_json(dvj, "array<string>"), F.lit("es"))
    row = (
        spark.read.parquet(manifest_dir(outdir))
        .agg(
            F.count("*").alias("total"),
            F.sum((dvj.isNull() | member).cast("long")).alias("q"),
        )
        .collect()[0]
    )
    assert row.total > 1 and int(row.q) == 0, f"dv sets pruned nothing ({row.q}/{row.total})"

    assert decode_dataset(spark, outdir, filters=[("cat", "=", "es")]).count() == 0
    got = decode_dataset(spark, outdir, filters=[("cat", "=", "de")])
    assert got.count() == df.where("cat = 'de'").count() > 0
    # IN mixing absent + present values stays exact (membership is ANY)
    got_in = decode_dataset(spark, outdir, filters=[("cat", "in", ["es", "de"])])
    assert got_in.count() == df.where("cat = 'de'").count()


def test_dv_pruning_through_datasource_reader(spark, outdir):
    from pyspark.sql.datasource import EqualTo

    from universal_parquet_exporter_spark.sources import spark_datasource as sds

    df = _dv_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    sds.register(spark)

    def kept(filters):
        r = sds._EncodedPushdownReader({"path": outdir})
        r.pushFilters(filters)
        return sum(len(p.chunks) for p in r.partitions())

    n_absent = kept([EqualTo(("cat",), "es")])
    n_present = kept([EqualTo(("cat",), "de")])
    assert n_absent == 0 < n_present
    got = (
        spark.read.format("upe_encoded").load(outdir).where("cat = 'de'").count()
    )
    assert got == df.where("cat = 'de'").count()


# ---------------------------------------------------------------------------
# startswith: prefix pruning on bounds and distinct sets
# ---------------------------------------------------------------------------


def test_startswith_prunes_on_key_bounds(spark, outdir):
    """Prefix scan on the clustered zero-padded key (the url-prefix
    shape): narrow per-chunk key bounds disqualify chunks outside the
    prefix range; the residual keeps the result exact."""
    from pyspark.sql import functions as F

    df = _dv_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)

    got = decode_dataset(spark, outdir, filters=[("k", "startswith", "00012")])
    assert sorted(r.k for r in got.collect()) == [f"000{i}" for i in range(120, 130)]
    # evidence: one aggregation row, most chunks' bounds exclude it
    mn = F.get_json_object(F.col("stats"), "$.k[0]")
    mx = F.get_json_object(F.col("stats"), "$.k[1]")
    pfx = F.lit("00012")
    survives = (mx.isNull() | (mx >= pfx)) & (
        mn.isNull() | (F.substring(mn, 1, 5) <= pfx)
    )
    row = (
        spark.read.parquet(manifest_dir(outdir))
        .agg(
            F.count("*").alias("total"),
            F.sum(survives.cast("long")).alias("q"),
        )
        .collect()[0]
    )
    assert 0 < int(row.q) < int(row.total)


def test_startswith_prunes_on_distinct_sets(spark, outdir):
    """'q' sits inside every chunk's [ar..zh] cat bounds, so bounds keep
    every chunk for prefix 'q' — only the recorded distinct sets can
    prove no member carries the prefix; a PRESENT prefix stays exact."""
    df = _dv_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)

    got_q = decode_dataset(spark, outdir, filters=[("cat", "startswith", "q")])
    assert got_q.count() == 0
    got_e = decode_dataset(spark, outdir, filters=[("cat", "startswith", "e")])
    assert got_e.count() == df.where("cat LIKE 'e%'").count() > 0


def test_startswith_validation(spark, outdir):
    df = _dv_df(spark, n=100)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    with pytest.raises(ValueError, match="startswith"):
        decode_dataset(spark, outdir, filters=[("k", "startswith", 5)])


# ---------------------------------------------------------------------------
# inequality (!= / not_in): pruning only the distinct sets can prove
# ---------------------------------------------------------------------------


def _ne_df(spark, n=600):
    """Clustered keys with a categorical that is CONSTANT ('en') over the
    first half of the key order and varied over the second: the all-'en'
    chunks record dv={en}, so `cat != 'en'` can prove they match nothing
    — the boilerplate-language-strip shape (drop the dominant lang)."""
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.lpad(F.col("id").cast("string"), 6, "0").alias("k"),
        F.when(F.col("id") < n // 2, F.lit("en"))
        .otherwise(
            F.element_at(
                F.array(F.lit("de"), F.lit("fr"), F.lit("zh")),
                (F.col("id") % 3 + 1).cast("int"),
            )
        )
        .alias("cat"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("text"),
    )


def test_ne_prunes_constant_chunks(spark, outdir):
    """`!=` prunes chunks whose exact value set is a subset of the
    rejected values; the residual keeps the result exact."""
    from pyspark.sql import functions as F

    df = _ne_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)

    # manifest evidence (single aggregation row): the first-half chunks
    # record dv == ['en'] exactly, and a chunk with any OTHER value keeps
    dvj = F.get_json_object(F.col("stats"), "$._dv.cat")
    survivor = F.exists(
        F.from_json(dvj, "array<string>"), lambda x: x != F.lit("en")
    )
    row = (
        spark.read.parquet(manifest_dir(outdir))
        .agg(
            F.count("*").alias("total"),
            F.sum((dvj.isNull() | survivor).cast("long")).alias("kept"),
        )
        .collect()[0]
    )
    assert 0 < int(row.kept) < int(row.total), (
        f"!= pruned nothing or everything ({row.kept}/{row.total})"
    )

    got = decode_dataset(spark, outdir, filters=[("cat", "!=", "en")])
    exp = df.where("cat != 'en'")
    assert got.count() == exp.count() > 0
    assert sorted(r.k for r in got.select("k").collect()) == sorted(
        r.k for r in exp.select("k").collect()
    )
    # <> is an alias; a value present everywhere keeps every chunk exact
    assert (
        decode_dataset(spark, outdir, filters=[("cat", "<>", "de")]).count()
        == df.where("cat != 'de'").count()
    )


def test_not_in_prunes_when_whole_set_rejected(spark, outdir):
    df = _ne_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    got = decode_dataset(spark, outdir, filters=[("cat", "not_in", ["en", "de"])])
    assert got.count() == df.where("cat NOT IN ('en', 'de')").count() > 0
    # rejecting every value the dataset holds decodes nothing
    none = decode_dataset(
        spark, outdir, filters=[("cat", "not_in", ["en", "de", "fr", "zh"])]
    )
    assert none.count() == 0
    with pytest.raises(ValueError, match="NOT_IN"):
        decode_dataset(spark, outdir, filters=[("cat", "not_in", [])])


def test_ne_null_semantics_and_all_null_chunks(spark, outdir):
    """SQL `col != v` rejects nulls; chunks that are ALL null prune for
    any inequality term through the null-count stats."""
    from pyspark.sql import functions as F

    df = spark.range(600).select(
        F.lpad(F.col("id").cast("string"), 6, "0").alias("k"),
        F.when(F.col("id") < 300, F.lit(None).cast("string"))
        .otherwise(F.lit("de"))
        .alias("cat"),
        F.concat(F.lit("payload-"), F.col("id").cast("string")).alias("text"),
    )
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    got = decode_dataset(spark, outdir, filters=[("cat", "!=", "en")])
    assert got.count() == df.where("cat != 'en'").count() == 300


def test_ne_pushdown_through_datasource_reader(spark, outdir):
    """Catalyst pushes `cat != 'en'` as Not(EqualTo) and NOT IN as
    Not(In); the reader prunes the all-'en' chunks and stays exact."""
    from pyspark.sql.datasource import EqualTo, In, Not

    from universal_parquet_exporter_spark.sources import spark_datasource as sds

    df = _ne_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    sds.register(spark)

    def kept(filters):
        r = sds._EncodedPushdownReader({"path": outdir})
        r.pushFilters(filters)
        return sum(len(p.chunks) for p in r.partitions())

    full = kept([])
    ne = kept([Not(EqualTo(("cat",), "en"))])
    nin = kept([Not(In(("cat",), ("en", "de", "fr", "zh")))])
    assert 0 < ne < full
    assert nin == 0
    got = (
        spark.read.format("upe_encoded").load(outdir).where("cat != 'en'").count()
    )
    assert got == df.where("cat != 'en'").count() > 0
    got_nin = (
        spark.read.format("upe_encoded").load(outdir)
        .where("cat NOT IN ('en', 'de')").count()
    )
    assert got_nin == df.where("cat NOT IN ('en', 'de')").count() > 0


# ---------------------------------------------------------------------------
# DNF filters (OR of AND-groups, pyarrow's list-of-lists convention)
# ---------------------------------------------------------------------------


def _dnf_encoded(spark, outdir):
    df = _typed_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    return df


def test_dnf_or_prunes_union_and_is_exact(spark, outdir):
    """The out-of-range scan ``k < a OR k >= b``: chunks covering the
    middle of the key range prune (neither group's bounds keep them),
    and the decode equals the plain OR predicate."""
    df = _dnf_encoded(spark, outdir)
    ev: dict = {}
    dec = decode_dataset(
        spark,
        outdir,
        filters=[[("k", "<", "000100")], [("k", ">=", "000500")]],
        pruning_evidence=ev,
    )
    got = sorted(r.k for r in dec.collect())
    exp = sorted(
        r.k for r in df.where((df.k < "000100") | (df.k >= "000500")).collect()
    )
    assert got == exp and len(got) > 0
    assert ev["qualifying"] < ev["total"], f"OR pruned nothing ({ev})"


def test_dnf_cross_column_or_is_exact(spark, outdir):
    """OR across DIFFERENT columns (ts window ∪ decimal threshold) —
    the union keep must lose nothing vs the plain predicate."""
    df = _dnf_encoded(spark, outdir)
    t1 = datetime(2024, 1, 3)
    p = Decimal("700.00")
    dec = decode_dataset(
        spark,
        outdir,
        filters=[[("ts", "<=", t1)], [("price", ">", p)]],
    )
    got = sorted(r.k for r in dec.collect())
    exp = sorted(r.k for r in df.where((df.ts <= t1) | (df.price > p)).collect())
    assert got == exp and len(got) > 0


def test_dnf_unprunable_group_disables_pruning_but_stays_exact(spark, outdir):
    """A group whose only term can't use manifest stats (dotted column
    name breaks the JSON path) keeps every chunk — the whole disjunction
    must then prune nothing (conservative), while the exact residual
    still applies the full OR-of-AND predicate."""
    from pyspark.sql import functions as F

    from universal_parquet_exporter_spark.encode.pipeline import load_or_build_plan
    from universal_parquet_exporter_spark.sources import spark_datasource as sds

    sds.register(spark)
    # the DataFrame encode path rejects dotted names (mapInArrow parses
    # them as struct paths) — the pure-Arrow upe_encoded sink takes them
    df = _typed_df(spark).withColumn("pr.ice", F.col("price")).drop("price")
    load_or_build_plan(
        df,
        EncodeJobConfig(
            output_dir=outdir, key_col="k", size_cols=("text",),
            target_unit_bytes=8 << 10, chunk_rows=64,
        ),
    )
    df.write.format("upe_encoded").option("key_col", "k").mode("append").save(outdir)
    ev: dict = {}
    p = Decimal("700.00")
    dec = decode_dataset(
        spark,
        outdir,
        filters=[[("k", "<", "000100")], [("pr.ice", ">", p)]],
        pruning_evidence=ev,
    )
    got = sorted(r.k for r in dec.collect())
    exp = sorted(
        r.k
        for r in df.where((F.col("k") < "000100") | (F.col("`pr.ice`") > p)).collect()
    )
    assert got == exp and len(got) > 0
    assert ev["qualifying"] == ev["total"]  # conservative: nothing pruned


def test_dnf_shape_validation(spark, outdir):
    _dnf_encoded(spark, outdir)
    with pytest.raises(ValueError, match="not a mix"):
        decode_dataset(
            spark, outdir, filters=[("k", "<", "1"), [("k", ">", "2")]]
        )
    with pytest.raises(ValueError, match="empty AND-group"):
        decode_dataset(spark, outdir, filters=[[("k", "<", "1")], []])
    with pytest.raises(ValueError, match="must be a"):
        decode_dataset(spark, outdir, filters=[[["k", "<", "1"]]])


# ---------------------------------------------------------------------------
# endswith / contains: distinct-set-only pruning + reader pushdown
# ---------------------------------------------------------------------------


def test_endswith_contains_prune_on_distinct_sets(spark, outdir):
    """No order relation to bounds exists for substring predicates, so
    only the exact distinct-value sets can prune; with evidence, an
    absent suffix/infix must qualify ZERO chunks while a present one
    stays exact."""
    df = _dv_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)

    ev: dict = {}
    got = decode_dataset(
        spark, outdir, filters=[("cat", "endswith", "qq")], pruning_evidence=ev
    )
    assert got.count() == 0 and ev["qualifying"] == 0 < ev["total"]
    got_e = decode_dataset(spark, outdir, filters=[("cat", "endswith", "e")])
    assert got_e.count() == df.where("cat LIKE '%e'").count() > 0

    ev2: dict = {}
    got_c = decode_dataset(
        spark, outdir, filters=[("cat", "contains", "qq")], pruning_evidence=ev2
    )
    assert got_c.count() == 0 and ev2["qualifying"] == 0 < ev2["total"]
    got_r = decode_dataset(spark, outdir, filters=[("cat", "contains", "r")])
    assert got_r.count() == df.where("cat LIKE '%r%'").count() > 0

    with pytest.raises(ValueError, match="endswith"):
        decode_dataset(spark, outdir, filters=[("k", "endswith", 5)])


def test_endswith_contains_nullsafe_pushdown_through_reader(spark, outdir):
    """Catalyst pushes StringEndsWith/StringContains/EqualNullSafe to the
    Python DataSource; the reader maps them to the same distinct-set /
    equality pruning terms, and results equal the plain predicates."""
    from universal_parquet_exporter_spark.sources import spark_datasource as sds

    sds.register(spark)
    df = _dv_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=8 << 10, chunk_rows=64,
    )
    encode_job(spark, df, cfg)
    src = spark.read.format("upe_encoded").load(outdir)

    assert src.where("cat LIKE '%qq'").count() == 0
    assert src.where("cat LIKE '%e'").count() == df.where("cat LIKE '%e'").count() > 0
    assert src.where("cat LIKE '%qq%'").count() == 0
    assert src.where("cat LIKE '%r%'").count() == df.where("cat LIKE '%r%'").count() > 0
    assert src.where("cat <=> 'de'").count() == df.where("cat = 'de'").count() > 0
    assert src.where("cat <=> 'qq'").count() == 0


# ---------------------------------------------------------------------------
# filter-driven unit pruning (key-column terms -> per-group ranges -> union)
# ---------------------------------------------------------------------------


def test_filter_driven_unit_pruning(spark, outdir):
    """Terms on the plan's key column prune whole encode UNITS before
    any chunk statistics are consulted — the same layer an explicit
    key_range drives, derived from the filters themselves."""
    df = _typed_df(spark)
    cfg = EncodeJobConfig(
        output_dir=outdir, key_col="k", size_cols=("text",),
        target_unit_bytes=512, chunk_rows=64,  # tiny units -> many to prune
    )
    encode_job(spark, df, cfg)

    ev: dict = {}
    dec = decode_dataset(
        spark, outdir, filters=[("k", ">=", "000500")], pruning_evidence=ev
    )
    assert ev["units_qualifying"] < ev["units_total"]
    assert dec.count() == df.where(df.k >= "000500").count() > 0

    # DNF: two disjoint key ranges union their units; the middle prunes
    ev2: dict = {}
    dec2 = decode_dataset(
        spark,
        outdir,
        filters=[[("k", "<", "000100")], [("k", ">=", "000500")]],
        pruning_evidence=ev2,
    )
    assert 0 < ev2["units_qualifying"] < ev2["units_total"]
    exp2 = df.where((df.k < "000100") | (df.k >= "000500")).count()
    assert dec2.count() == exp2 > 0

    # a group with no key term leaves its range unbounded -> the whole
    # disjunction keeps every unit (conservative, no unit evidence)
    ev3: dict = {}
    dec3 = decode_dataset(
        spark,
        outdir,
        filters=[[("k", ">=", "000500")], [("price", ">", Decimal("100.00"))]],
        pruning_evidence=ev3,
    )
    assert "units_total" not in ev3
    exp3 = df.where((df.k >= "000500") | (df.price > Decimal("100.00"))).count()
    assert dec3.count() == exp3 > 0


def test_key_range_from_terms_algebra():
    from universal_parquet_exporter_spark.encode.pipeline import key_range_from_terms

    assert key_range_from_terms([("k", ">=", "b"), ("k", "<", "g")], "k") == ("b", "g")
    assert key_range_from_terms([("k", "=", "m")], "k") == ("m", "m")
    assert key_range_from_terms([("k", "startswith", "ab")], "k") == ("ab", None)
    assert key_range_from_terms([("k", "in", ("d", "b", "f"))], "k") == ("b", "f")
    assert key_range_from_terms([("x", ">=", "b")], "k") == (None, None)
    assert key_range_from_terms([("k", ">=", 5)], "k") == (None, None)  # non-string
