"""PageRank (operators/graph.py): mass conservation, symmetric-graph
uniformity, agreement with a dense numpy power iteration, dangling nodes."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.graph import pagerank, top_ranked


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_ring_graph_uniform(spark):
    """A directed ring is perfectly symmetric: every node must end at 1/n."""
    n = 12
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    got = _ranks(pagerank(edges, n_iter=10))
    assert len(got) == n
    for v in got.values():
        assert v == pytest.approx(1.0 / n, rel=1e-9)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_matches_numpy_power_iteration(spark):
    """Small digraph with a dangling node (3 has no out-edges): Spark ranks
    must match the dense reference including dangling redistribution."""
    edge_list = [(0, 1), (0, 2), (1, 2), (2, 0), (1, 3)]
    n, d, iters = 4, 0.85, 25
    edges = spark.createDataFrame(edge_list, "src long, dst long")
    got = _ranks(pagerank(edges, damping=d, n_iter=iters))

    # numpy reference
    M = np.zeros((n, n))
    out = {0: 2, 1: 2, 2: 1}
    for s, t in edge_list:
        M[t, s] = 1.0 / out[s]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[3]  # node 3 has no out-edges
        r = (1 - d) / n + d * (M @ r + dangling / n)
    for i in range(n):
        assert got[i] == pytest.approx(r[i], rel=1e-9), i
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)


def test_fixture_bipartite_graph(spark):
    """Customer->supplier shipment graph from the fixtures: ranks conserve
    mass and favor high-in-degree suppliers."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + 1_000_000).alias("dst"),
        )
        .distinct()
    )
    ranks = pagerank(edges, n_iter=8).cache()
    total = ranks.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(1.0, rel=1e-6)
    top = top_ranked(ranks, k=5).collect()
    assert len(top) == 5
    # suppliers receive all in-edges here, so the top ranks must be suppliers
    assert all(r["node"] >= 1_000_000 for r in top)
