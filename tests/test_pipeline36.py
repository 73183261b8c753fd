"""Behavioral pins for batch 36: BPE training vs a pure-Python reference,
JL distortion concentration, ACID DML rewrite accounting."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _reference_bpe(word_counts: dict[str, int], n_merges: int, batch_k: int = 1):
    """The identical algorithm, replayed in pure Python: per round, rank
    adjacent pairs (count desc, lexicographic ties), greedily accept up
    to batch_k NON-INTERACTING pairs (no symbol or concatenation touching
    an accepted pair's -- the same rule as
    operators/tokenize.py::select_batch_merges), then merge them all
    left-to-right non-overlapping in one pass with a single carried
    symbol. batch_k=1 is classic sequential BPE."""
    state = {w: tuple(w) for w in word_counts}
    merges = []
    while len(merges) < n_merges:
        want = min(batch_k, n_merges - len(merges))
        pairs: Counter = Counter()
        for w, syms in state.items():
            c = word_counts[w]
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        # the candidate window is PART of the algorithm (bpe_train collects
        # only the top 8*want ranked pairs per round) -- mirror it exactly
        ranked = ranked[: max(8 * want, 8)]
        batch, touched = [], set()
        for (a, b), n in ranked:
            if len(batch) >= want:
                break
            cand = {a, b, a + b}
            if cand & touched:
                continue
            batch.append((a, b, n))
            touched |= cand
        for a, b, n in batch:
            merges.append((len(merges), a, b, n))
        pairset = {(a, b): a + b for a, b, _ in batch}
        new_state = {}
        for w, syms in state.items():
            out, carry = [], None
            for x in syms:
                if carry is None:
                    carry = x
                elif (carry, x) in pairset:
                    out.append(pairset[(carry, x)])
                    carry = None
                else:
                    out.append(carry)
                    carry = x
            if carry is not None:
                out.append(carry)
            new_state[w] = tuple(out)
        state = new_state
    return merges


def test_batched_bpe_unit_semantics(spark):
    """batch_k=1 reproduces classic sequential BPE; batch_k>1 selects
    non-interacting pairs and applies them in ONE fold with identical
    within-round counts -- pinned against the pure-Python replay on a
    tiny synthetic vocabulary (fast, engine-level)."""
    from hive_person_service_spark.operators.tokenize import bpe_train

    wc = {"banana": 30, "bandana": 20, "cabana": 10, "anagram": 5, "naan": 4}
    words = spark.createDataFrame(list(wc.items()), "word string, cnt long")
    for k in (1, 3):
        got = [(s, a, b, n) for s, a, b, n in bpe_train(words, n_merges=6, batch_k=k)]
        assert got == _reference_bpe(wc, 6, batch_k=k), f"batch_k={k}"


def test_bpe_train_matches_reference(spark):
    from hive_person_service_spark.plans.pipeline36 import text_bpe_train
    from hive_person_service_spark.sources import load_table

    got = [
        (r.step, r.sym_a, r.sym_b, r.pair_count)
        for r in text_bpe_train(spark, SF_SMALL).orderBy("step").collect()
    ]
    d = load_table(spark, SF_SMALL, "documents")
    wc = {
        r.word: r.cnt
        for r in (
            d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
            .where((F.col("word") != "") & F.col("word").rlike("^[a-z]+$"))
            .groupBy("word")
            .agg(F.count("*").alias("cnt"))
            .collect()
        )
    }
    expected = _reference_bpe(wc, 10, batch_k=5)  # the declared schedule
    assert got == expected
    assert len(got) == 10
    # learned merges must be strictly useful: every count > 0 and
    # non-increasing is NOT required (later merges can beat earlier
    # leftovers), but counts are positive.
    assert all(n > 0 for _, _, _, n in got)


def test_jl_norm_ratio_concentrates(spark):
    """E[|Pv|^2 / |v|^2] = 1 for a Gaussian JL projection; with 16 output
    dims the ratio is chi^2_16/16 — mean ~1, essentially always within
    [0.15, 3.5]. A systematic bias would mean the hash-Gaussians are
    broken (non-zero mean or wrong variance)."""
    from hive_person_service_spark.plans.pipeline36 import (
        emb_random_projection_jl,
    )

    rows = emb_random_projection_jl(spark, SF_SMALL).collect()
    assert len(rows) == 200
    ratios = [r.norm_ratio for r in rows]
    mean = sum(ratios) / len(ratios)
    assert 0.8 < mean < 1.2
    assert all(0.05 < x < 5.0 for x in ratios)


def test_dml_rewrite_counts(spark, tmp_path):
    from hive_person_service_spark.operators.maintenance import (
        delete_where,
        update_set,
    )
    from hive_person_service_spark.sources import load_table

    path = str(tmp_path / "orders_dml")
    o = load_table(spark, SF_SMALL, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    o.write.parquet(path)
    n0 = o.count()
    cond = (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000)
    expected_del = o.where(cond).count()
    deleted = delete_where(spark, path, cond)
    assert deleted == expected_del
    assert spark.read.parquet(path).count() == n0 - expected_del

    upd_cond = F.col("o_totalprice") >= 400000
    expected_upd = spark.read.parquet(path).where(upd_cond).count()
    matched = update_set(
        spark, path, upd_cond, {"o_orderstatus": F.lit("X")}
    )
    assert matched == expected_upd
    after = spark.read.parquet(path)
    assert after.where(F.col("o_orderstatus") == "X").count() == expected_upd
    assert after.count() == n0 - expected_del  # update never changes row count


def test_delete_where_keeps_null_predicate_rows(spark, tmp_path):
    """SQL DELETE ... WHERE deletes only rows where the predicate is TRUE;
    rows where it evaluates to NULL (nullable column) must survive."""
    from hive_person_service_spark.operators.maintenance import delete_where

    path = str(tmp_path / "null_pred")
    spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 99.0), (4, None), (5, 5.0)],
        "id int, v double",
    ).write.parquet(path)
    deleted = delete_where(spark, path, F.col("v") > 50)
    assert deleted == 1  # only id=3; the two NULL-v rows are KEPT
    kept_ids = {r.id for r in spark.read.parquet(path).collect()}
    assert kept_ids == {1, 2, 4, 5}
