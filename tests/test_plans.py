"""Physical-plan quality gates: the scale properties SURVEY.md §4.2 claims
must be visible in `.explain` output — predicate pushdown to the parquet
scan, column pruning, broadcast for small dimensions, TakeOrderedAndProject
for top-k. A plan regression here is a 100TB regression."""

import pytest

from tests.conftest import SF_SMOKE
from universal_parquet_exporter_spark.operators import dedup, relational, similarity


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def optimized_of(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    df = relational.q_filter_compare(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan


def test_column_pruning_reaches_scan(spark):
    df = relational.q_projection_alias(spark, SF_SMOKE)
    plan = plan_of(df)
    # ReadSchema must not include unprojected columns
    assert "c_acctbal" not in plan.split("ReadSchema")[1].split("\n")[0]


def test_topk_plans_take_ordered(spark):
    df = relational.q_topk(spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in plan_of(df)


def test_small_dim_joins_broadcast(spark):
    df = relational.q_join_chain(spark, SF_SMOKE)
    assert "BroadcastHashJoin" in plan_of(df)


def test_semi_join_is_semi(spark):
    df = relational.q_join_semi_distinct(spark, SF_SMOKE)
    assert "LeftSemi" in optimized_of(df)


def test_brute_force_topk_is_joinless_map(spark):
    """The query matrix ships inside the map function: the corpus scan is a
    single narrow MapInArrow pass — no join, no corpus-wide shuffle before
    the (tiny) local-top-k aggregation."""
    df = similarity.q_embed_topk(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan
    assert "Join" not in plan


def test_exact_dedup_shuffles_narrow_rows(spark):
    """Winner election must exchange only (fingerprint, doc_id) pairs —
    never the document bodies — and must not use a window (whole-row
    sort shuffle)."""
    df = dedup.q_dedup_exact(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "Window" not in plan
    assert "Exchange hashpartitioning(fingerprint" in plan
    exchange_line = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln][0]
    assert "text" not in exchange_line


def test_ngram_jaccard_avoids_window(spark):
    """Prefix derivation is a groupBy aggregation (per-group in-memory
    sort), not a row_number window over the exploded token stream."""
    df = dedup.q_dedup_ngram_jaccard(spark, SF_SMOKE)
    assert "Window" not in plan_of(df)


def test_srp_bucketing_is_joinless_map(spark):
    """SRP bucket assignment ships the hyperplane matrix inside the map
    function: one narrow MapInArrow pass, no join, no shuffle."""
    docs = dedup._t(spark, SF_SMOKE, "embeddings")
    df = similarity.srp_buckets(docs, planes=docs, n_planes=6)
    plan = plan_of(df)
    assert "MapInArrow" in plan or "PythonMapInArrow" in plan
    assert "Join" not in plan and "Exchange" not in plan


def test_no_python_udfs_in_relational_plans(spark):
    """The §2B surface must be pure Catalyst — no Python eval nodes."""
    for name in [
        "q_join_left_agg",
        "q_agg_grouped",
        "q_window_rank_partitioned",
        "q_scalar_funcs",
    ]:
        df = getattr(relational, name)(spark, SF_SMOKE)
        plan = plan_of(df)
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, name


def test_repetition_score_is_zero_shuffle_projection(spark):
    """The repetition scorer must stay one narrow whole-stage-codegen
    projection: no exchange, no Python eval, at any corpus size."""
    from universal_parquet_exporter_spark.operators import textstats

    df = textstats.q_repetition_score(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_incremental_dedup_anti_join_is_narrow(spark):
    """Incremental ingest must anti-join projected signatures only —
    LeftAnti in the optimized plan and no document text in any
    exchange."""
    df = dedup.q_dedup_incremental(spark, SF_SMOKE)
    assert "LeftAnti" in optimized_of(df)
    plan = plan_of(df)
    for ln in plan.splitlines():
        if "Exchange" in ln:
            assert "text#" not in ln


def test_stratified_sample_is_zero_shuffle_filter(spark):
    """The sample election must be one narrow codegen filter — no
    exchange, no Python — so it composes in front of anything."""
    from universal_parquet_exporter_spark.operators import sampling

    df = sampling.q_sample_stratified(spark, SF_SMOKE)
    plan = plan_of(df)
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
