"""Behavioral pins for MMR diversified retrieval (operators/mmr.py):
the lambda=1 identity with plain cosine top-k, an INDEPENDENT quadratic
reference replay of the greedy selection, diversity actually moving the
result on a dup-heavy pool, and determinism."""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_SMALL


def _reference_mmr(rel, sims, k, lam):
    """Slow independent reference: literal argmax of the MMR objective,
    ties to the lowest index."""
    n = len(rel)
    chosen = []
    while len(chosen) < min(k, n):
        best, best_score = None, None
        for i in range(n):
            if i in chosen:
                continue
            pen = max((sims[i][j] for j in chosen), default=0.0)
            s = lam * rel[i] - (1 - lam) * pen
            if best is None or s > best_score:
                best, best_score = i, s
        chosen.append(best)
    return chosen


def test_mmr_select_matches_reference():
    from hive_person_service_spark.operators.mmr import mmr_select

    rng = np.random.RandomState(5)
    for trial in range(20):
        n = rng.randint(3, 30)
        v = rng.randn(n, 8)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        sims = np.round(v @ v.T, 6)
        rel = np.round(rng.rand(n), 6)
        for lam in (0.0, 0.3, 0.7, 1.0):
            got = mmr_select(rel, sims, k=min(10, n), lam=lam)
            ref = _reference_mmr(rel.tolist(), sims.tolist(), min(10, n), lam)
            assert got == ref, (trial, lam)


def test_lambda_one_reduces_to_plain_topk(spark):
    """MMR at lambda=1 must return EXACTLY the plain cosine top-k (same
    ids, same order) -- the identity that anchors the rows-only query to
    the oracle-checked sim_topk."""
    from hive_person_service_spark.operators.mmr import mmr_topk
    from hive_person_service_spark.plans.vector_pipeline import sim_topk
    from hive_person_service_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    got = [
        r.vec_id
        for r in mmr_topk(spark, emb, k=10, pool=50, lam=1.0)
        .orderBy("rank")
        .collect()
    ]
    want = [r.vec_id for r in sim_topk(spark, SF_SMALL).collect()]
    assert got == want


def test_diversity_changes_picks_on_dup_heavy_pool(spark):
    """On the fixture corpus (which contains near-duplicate embeddings),
    lambda=0.7 must (a) keep the top-1 pick, (b) change the selected SET
    vs plain top-k, and (c) not increase the maximum pairwise similarity
    inside the selection."""
    from hive_person_service_spark.operators.mmr import mmr_topk
    from hive_person_service_spark.sources import load_table

    emb = load_table(spark, SF_SMALL, "embeddings")
    plain = mmr_topk(spark, emb, k=10, pool=50, lam=1.0).collect()
    div = mmr_topk(spark, emb, k=10, pool=50, lam=0.7).collect()
    assert div[0].vec_id == plain[0].vec_id  # first pick = most relevant
    ids_plain = {r.vec_id for r in plain}
    ids_div = {r.vec_id for r in div}
    assert ids_div != ids_plain

    def max_pair_sim(ids):
        rows = emb.where(emb.vec_id.isin([int(i) for i in ids])).collect()
        v = np.array([r.embedding for r in rows], dtype=np.float64)
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        s = v @ v.T
        np.fill_diagonal(s, -1)
        return s.max()

    assert max_pair_sim(ids_div) <= max_pair_sim(ids_plain) + 1e-9

    # determinism
    again = mmr_topk(spark, emb, k=10, pool=50, lam=0.7).collect()
    assert [r.vec_id for r in again] == [r.vec_id for r in div]
