"""Persistent IVF index: build/search round-trip, partition pruning, and
the nprobe recall knob."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from es_ch_sync_spark.io.ann_index import build_ivf_index, probe_cells, search_ivf_index
from es_ch_sync_spark.operators.clustering import ivf_topk
from es_ch_sync_spark.operators.similarity import cosine_topk


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def qv(sf_dir):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return t.column("embedding").to_pylist()[t.column("vec_id").to_pylist().index(0)]


@pytest.fixture(scope="module")
def index_path(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    build_ivf_index(emb, path, n_cells=4, iters=2)
    return path


def test_search_matches_relational_ivf(spark, emb, qv, index_path):
    """nprobe=1 search over the materialized index must return exactly what
    the per-query relational IVF (same quantizer params) returns."""
    want = [(r["vec_id"], r["cos_sim"]) for r in
            ivf_topk(emb, qv, k=10, n_cells=4, iters=2, exclude_id=0).collect()]
    got = [(r["vec_id"], r["cos_sim"]) for r in
           search_ivf_index(spark, index_path, qv, k=10, nprobe=1, exclude_id=0).collect()]
    assert got == want and len(got) == 10


def test_full_probe_equals_exact(spark, emb, qv, index_path):
    """nprobe = n_cells degrades gracefully to exact brute-force top-k."""
    want = [(r["vec_id"], r["cos_sim"]) for r in
            cosine_topk(emb, qv, k=10, exclude_id=0).collect()]
    got = [(r["vec_id"], r["cos_sim"]) for r in
           search_ivf_index(spark, index_path, qv, k=10, nprobe=4, exclude_id=0).collect()]
    assert got == want


def test_search_scan_is_partition_pruned(spark, qv, index_path):
    """The cell IN (…) filter must land as a PartitionFilter on the vector
    scan — unprobed inverted lists are never read.  This is the entire
    point of materializing the index."""
    df = search_ivf_index(spark, index_path, qv, k=10, nprobe=1, exclude_id=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cell" in m.group(1), plan


def test_probe_cells_bounded(spark, qv, index_path):
    cells = probe_cells(spark, index_path, qv, nprobe=2)
    assert len(cells) == 2 and len(set(cells)) == 2
