"""Recall of the approximate neighbor searches vs the exact baseline.

The driver oracles pin exact engine/oracle agreement for each ANN query,
but say nothing about how much the LSH/IVF blocking gives up vs the
brute-force answer — the standard ANN quality figure.  This measures
recall@1 of ``embed_ann_lsh`` and ``embed_ann_ivf`` against
``embed_topk`` on the sf0.001 embeddings table and enforces a floor
(documented in BENCH/BASELINE.md).

A query "recalls" its exact neighbor if the approximate search returns
the same neighbor_id OR a neighbor with the same rounded similarity (a
cosine tie is as good as the argmax)."""

import os

import pytest

from universal_parquet_exporter_spark.operators.similarity import (
    q_embed_ann_ivf,
    q_embed_ann_lsh,
    q_embed_topk,
)

SF_SMOKE = os.path.join(
    os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata"), "sf0.001"
)

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_SMOKE), reason="driver testdata not present"
)

RECALL_FLOOR = 0.9


def _recall_vs_exact(spark, approx_fn) -> float:
    exact = {r.query_id: (r.neighbor_id, r.sim) for r in q_embed_topk(spark, SF_SMOKE).collect()}
    approx = {r.query_id: (r.neighbor_id, r.sim) for r in approx_fn(spark, SF_SMOKE).collect()}
    hits = sum(
        1
        for q, (nid, sim) in exact.items()
        if q in approx and (approx[q][0] == nid or round(approx[q][1], 4) >= round(sim, 4))
    )
    return hits / len(exact)


def test_lsh_recall_at_1(spark):
    r = _recall_vs_exact(spark, q_embed_ann_lsh)
    assert r >= RECALL_FLOOR, f"LSH recall@1 {r:.3f} < {RECALL_FLOOR}"


def test_ivf_recall_at_1(spark):
    r = _recall_vs_exact(spark, q_embed_ann_ivf)
    assert r >= RECALL_FLOOR, f"IVF recall@1 {r:.3f} < {RECALL_FLOOR}"
