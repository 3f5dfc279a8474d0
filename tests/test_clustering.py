"""F8 union-find / clustering micro-graphs + property tests (SURVEY §5.4)."""

import pandas as pd
import pytest

from semanticizer_ray.config import ClusterConfig, EngineConfig
from semanticizer_ray.stages.clustering import cluster_edges, unionfind_reference

CASES = {
    "chain": ([("a", "b"), ("b", "c"), ("c", "d")], {"a": "a", "b": "a", "c": "a", "d": "a"}),
    "star": ([("m", "a"), ("m", "b"), ("m", "c")], {"m": "a", "a": "a", "b": "a", "c": "a"}),
    "two_components": (
        [("a", "b"), ("x", "y")],
        {"a": "a", "b": "a", "x": "x", "y": "x"},
    ),
    "self_loop": ([("a", "a"), ("a", "b")], {"a": "a", "b": "a"}),
    "duplicate_edges": ([("a", "b"), ("b", "a"), ("a", "b")], {"a": "a", "b": "a"}),
}


def test_unionfind_reference():
    for name, (edges, want) in CASES.items():
        got = unionfind_reference(edges)
        assert got == want, name


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0])  # driver / distributed
@pytest.mark.parametrize("local_contract", [True, False])
@pytest.mark.parametrize("case", list(CASES))
def test_cluster_edges_micro(ray_session, case, local_contract, driver_threshold):
    import ray.data as rd

    edges, want = CASES[case]
    ds = rd.from_pandas(
        pd.DataFrame({"conv_a": [e[0] for e in edges], "conv_b": [e[1] for e in edges]})
    )
    cfg = EngineConfig(
        cluster=ClusterConfig(
            local_contract=local_contract, driver_edge_threshold=driver_threshold
        )
    )
    out = cluster_edges(ds, None, cfg).to_pandas()
    got = dict(zip(out["conv_id"], out["cluster_id"]))
    assert got == want, case


def test_cluster_singletons_and_partition(ray_session):
    import ray.data as rd

    edges = rd.from_pandas(pd.DataFrame({"conv_a": ["a"], "conv_b": ["b"]}))
    nodes = rd.from_pandas(pd.DataFrame({"conv_id": ["a", "b", "z"]}))
    out = cluster_edges(edges, nodes, EngineConfig()).to_pandas()
    got = dict(zip(out["conv_id"], out["cluster_id"]))
    assert got == {"a": "a", "b": "a", "z": "z"}
    # clustering is a partition: every node exactly once
    assert out["conv_id"].is_unique


@pytest.mark.parametrize("driver_threshold", [2_000_000, 0])
def test_cluster_matches_reference_random(ray_session, driver_threshold):
    """Random graph: distributed result == driver union-find."""
    import numpy as np
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 200
    edges = [
        (f"n{int(a):03d}", f"n{int(b):03d}")
        for a, b in rng.integers(0, n, size=(150, 2))
    ]
    nodes = [f"n{i:03d}" for i in range(n)]
    want = unionfind_reference(edges, nodes)
    ds = rd.from_pandas(
        pd.DataFrame({"conv_a": [e[0] for e in edges], "conv_b": [e[1] for e in edges]})
    )
    nd = rd.from_pandas(pd.DataFrame({"conv_id": nodes}))
    cfg = EngineConfig(cluster=ClusterConfig(driver_edge_threshold=driver_threshold))
    out = cluster_edges(ds, nd, cfg).to_pandas()
    got = dict(zip(out["conv_id"], out["cluster_id"]))
    assert got == want


def test_is_match_filter(ray_session):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "conv_a": ["a", "c"],
            "conv_b": ["b", "d"],
            "is_match": [True, False],  # bridge edge below threshold
        }
    )
    out = cluster_edges(rd.from_pandas(df), None, EngineConfig()).to_pandas()
    got = dict(zip(out["conv_id"], out["cluster_id"]))
    assert got["a"] == "a" and got["b"] == "a"
    # c,d edge filtered: endpoints may be absent entirely (no all_nodes given)
    assert got.get("c", "c") == "c" and got.get("d", "d") == "d"
