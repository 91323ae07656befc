"""Connected-components tests: hand-built graphs + oracle closure."""

import pandas as pd

from wdedup_spark import oracle
from wdedup_spark.operators.cluster import cluster_assignments, connected_components


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["conv_a", "conv_b"]))


import pytest


@pytest.mark.parametrize("small_thresh", [2_000_000, 0], ids=["driver-uf", "distributed"])
def test_cc_basic_chain(spark, small_thresh):
    # chain a-b-c-d plus isolated pair e-f — both execution strategies
    edges = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")])
    got = {
        r["conv_id"]: r["cluster_id"]
        for r in connected_components(edges, small_graph_edges=small_thresh).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a", "e": "e", "f": "e"}


@pytest.mark.parametrize("small_thresh", [2_000_000, 0], ids=["driver-uf", "distributed"])
def test_cc_long_path_converges(spark, small_thresh):
    # path of 33 nodes — needs multiple hash-to-min iterations
    n = 33
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = _edges(spark, list(zip(nodes[:-1], nodes[1:])))
    got = {
        r["conv_id"]: r["cluster_id"]
        for r in connected_components(edges, small_graph_edges=small_thresh).collect()
    }
    assert set(got.values()) == {"n000"}
    assert len(got) == n


def test_cluster_assignments_singletons(spark):
    all_ids = spark.createDataFrame(pd.DataFrame({"conv_id": ["a", "b", "c", "z"]}))
    edges = _edges(spark, [("a", "b")])
    got = {r["conv_id"]: r["cluster_id"] for r in cluster_assignments(all_ids, edges).collect()}
    assert got == {"a": "a", "b": "a", "c": "c", "z": "z"}


def test_cc_matches_union_find_oracle(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    ids = [f"v{i:03d}" for i in range(120)]
    pairs = set()
    while len(pairs) < 150:
        a, b = rng.choice(120, 2, replace=False)
        pairs.add((ids[min(a, b)], ids[max(a, b)]))
    pairs = sorted(pairs)
    edges = _edges(spark, pairs)
    got = {r["conv_id"]: r["cluster_id"] for r in connected_components(edges).collect()}
    want = oracle.transitive_closure_min(
        pd.DataFrame(pairs, columns=["conv_a", "conv_b"]), list(got.keys())
    )
    assert got == want


def test_cc_distributed_with_reliable_checkpoint(spark, tmp_path):
    """With a checkpoint dir configured, the distributed path must use
    reliable checkpoint() (executor-loss tolerant on a real cluster) and
    produce identical components."""
    import numpy as np

    from wdedup_spark.operators import cluster as cl

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    try:
        rng = np.random.default_rng(9)
        # a long path (worst case for propagation) + random unions
        edges_py = [(i, i + 1) for i in range(0, 60)] + [
            (int(rng.integers(100, 160)), int(rng.integers(100, 160))) for _ in range(40)
        ]
        edges = spark.createDataFrame(edges_py, "conv_a long, conv_b long")
        got = {
            r["conv_id"]: r["cluster_id"]
            for r in cl.connected_components(edges, small_graph_edges=0).collect()
        }
        # oracle: driver union-find over the same edges
        want = {
            r["conv_id"]: r["cluster_id"]
            for r in cl.connected_components(edges, small_graph_edges=10**9).collect()
        }
        assert got == want
        # the reliable path really engaged (checkpoint dir is non-empty)
        import os

        assert any(os.scandir(str(tmp_path / "ckpt")))
    finally:
        # later tests in the session fall back to localCheckpoint only if
        # no dir is set; leaving it set is safe (strictly more durable)
        pass
