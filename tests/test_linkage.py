"""Differential pin of the Jaro-Winkler scorer (operators/linkage.py)
against DuckDB's native ``jaro_winkler_similarity``, plus BFS frontier
traversal (operators/graph.py bfs_distances) on a hand-built graph.

The scorer pin is what justifies `dedup_entity_jarowinkler` being a full
oracle-checked query instead of rows-only: if Python and DuckDB agree
bit-for-bit on random strings, a query built on the scorer can be
replayed by the oracle with DuckDB's builtin.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from hive_person_service_spark.operators.linkage import jaro_winkler


KNOWN = [
    # classic textbook pairs
    ("martha", "marhta"),
    ("dixon", "dicksonx"),
    ("jellyfish", "smellyfish"),
    ("duane", "dwayne"),
    # edges
    ("", ""),
    ("", "abc"),
    ("abc", ""),
    ("a", "a"),
    ("abc", "abc"),
    ("abcdef", "fedcba"),
]


def _duck_jw(pairs):
    con = duckdb.connect()
    try:
        rows = con.execute(
            "SELECT jaro_winkler_similarity(a, b) FROM "
            "(SELECT unnest(?::VARCHAR[]) AS a, unnest(?::VARCHAR[]) AS b)",
            [[p[0] for p in pairs], [p[1] for p in pairs]],
        ).fetchall()
    finally:
        con.close()
    return [r[0] for r in rows]


def test_jaro_winkler_known_pairs():
    got = [jaro_winkler(a, b) for a, b in KNOWN]
    want = _duck_jw(KNOWN)
    assert got == pytest.approx(want, abs=0.0), list(zip(KNOWN, got, want))


def test_jaro_winkler_random_differential():
    """500 random pairs (shared alphabet so matches are common, varied
    lengths incl. empty) must agree bit-for-bit with DuckDB."""
    rng = random.Random(45045)
    alpha = "abcdefgh"
    pairs = []
    for _ in range(500):
        la, lb = rng.randint(0, 12), rng.randint(0, 12)
        a = "".join(rng.choice(alpha) for _ in range(la))
        b = "".join(rng.choice(alpha) for _ in range(lb))
        if rng.random() < 0.3 and a:
            # typo'd copy: swap two adjacent chars of a
            i = rng.randrange(max(1, len(a) - 1))
            b = a[:i] + a[i + 1 : i + 2] + a[i : i + 1] + a[i + 2 :]
        pairs.append((a, b))
    got = [jaro_winkler(a, b) for a, b in pairs]
    want = _duck_jw(pairs)
    bad = [
        (p, g, w)
        for p, g, w in zip(pairs, got, want)
        if g != pytest.approx(w, abs=0.0)
    ]
    assert not bad, bad[:10]


def test_jaro_winkler_udf_nulls(spark):
    """Arrow-batched UDF path: NULL on either side -> NULL score."""
    from hive_person_service_spark.operators.linkage import jaro_winkler_udf

    df = spark.createDataFrame(
        [("martha", "marhta"), (None, "x"), ("x", None), ("", "abc")],
        "a STRING, b STRING",
    ).select(jaro_winkler_udf("a", "b").alias("jw"))
    rows = [r.jw for r in df.collect()]
    assert rows[0] == pytest.approx(0.9611111111111111, abs=0.0)
    assert rows[1] is None and rows[2] is None
    assert rows[3] == 0.0


def test_bfs_distances_chain_with_shortcut(spark):
    """Graph: 1->2->3->4->5 chain plus shortcut 1->4 and an unreachable
    island 9->10. BFS must settle 4 at its MINIMAL depth (1, via the
    shortcut, not 3 via the chain) and never visit the island."""
    from hive_person_service_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (1, 4), (9, 10)],
        "src LONG, dst LONG",
    )
    got = {r.node: r.hops for r in bfs_distances(edges, 1).collect()}
    assert got == {1: 0, 2: 1, 4: 1, 3: 2, 5: 2}


def test_bfs_distances_max_hops(spark):
    from hive_person_service_spark.operators.graph import bfs_distances

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(10)], "src LONG, dst LONG"
    )
    got = {r.node: r.hops for r in bfs_distances(edges, 0, max_hops=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
