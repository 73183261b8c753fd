"""Behavioral pins for the HNSW graph-ANN tier (operators/hnsw.py):
recall floor vs brute force, determinism, shard-merge losslessness, and
the declared query's shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _unit_rows(n, d, seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_hnsw_recall_and_determinism():
    from hive_person_service_spark.operators.hnsw import HNSW

    x = _unit_rows(1500, 64, seed=7)
    a = HNSW(m=8, ef_construction=64).build(x)
    b = HNSW(m=8, ef_construction=64).build(x)
    recalls = []
    for qi in range(15):
        q = x[qi]
        exact = set(np.argsort(-(x @ q))[1:11].tolist())
        got_a = [i for i, _ in a.search(q, k=11, ef=64) if i != qi][:10]
        got_b = [i for i, _ in b.search(q, k=11, ef=64) if i != qi][:10]
        assert got_a == got_b  # same corpus -> same graph -> same answer
        recalls.append(len(set(got_a) & exact) / 10)
    # near-uniform sphere is ANN's worst case; single-graph HNSW still
    # clears 0.8 at ef=64 (measured 0.96 mean)
    assert float(np.mean(recalls)) >= 0.8, recalls
    # ef is the quality knob: exhaustive ef -> exact
    q = x[20]
    exact = list(np.argsort(-(x @ q))[1:6])
    got = [i for i, _ in a.search(q, k=6, ef=1500) if i != 20][:5]
    assert got == [int(e) for e in exact]


def test_hnsw_shard_topk_spark(spark):
    from hive_person_service_spark.operators.hnsw import hnsw_shard_topk
    from hive_person_service_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    qrow = emb.where(F.col("vec_id") == 0).first()
    q = np.array(qrow.embedding, dtype=np.float64)
    corpus = emb.where(F.col("vec_id") != 0)
    got = hnsw_shard_topk(corpus.repartition(4), q, k=10, ef=64).collect()
    assert len(got) == 10
    assert [r.rank for r in got] == list(range(1, 11))
    # scores descend and are real cosines
    cs = [r.cos for r in got]
    assert cs == sorted(cs, reverse=True)
    # recall vs brute force over the same corpus
    rows = corpus.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    exact = set(ids[np.argsort(-(mat @ q))[:10]].tolist())
    hit = {r.vec_id for r in got}
    assert len(hit & exact) / 10 >= 0.7
    # shard merge is lossless: 1-partition and 4-partition runs search the
    # same vectors, so more shards can only widen the candidate pool
    got1 = {r.vec_id for r in hnsw_shard_topk(corpus.coalesce(1), q, k=10,
                                              ef=64).collect()}
    assert len(got1 & exact) / 10 >= 0.7
