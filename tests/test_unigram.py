"""Unigram-LM tokenizer training pins (operators/tokenize.py round 8):
the distributed EM (substring seeding, per-round Viterbi E-step,
integer M-step, deterministic pruning) replayed in pure Python over the
same word counts must produce the identical vocab row for row -- the
text_bpe_train certification recipe."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hive_person_service_spark.operators.tokenize import (
    unigram_train,
    viterbi_segment,
)


def _reference_unigram(word_counts, n_rounds, max_len, seed_size, vocab_size):
    """Pure-Python replay of unigram_train's orchestration (the DP is
    the SHARED viterbi_segment definition)."""
    subs: dict[str, int] = {}
    for w, c in word_counts.items():
        for s in range(len(w)):
            for ln in range(1, min(max_len, len(w) - s) + 1):
                subs[w[s : s + ln]] = subs.get(w[s : s + ln], 0) + c
    chars = {p: n for p, n in subs.items() if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in subs.items() if len(p) >= 2),
        key=lambda pn: (-pn[1], pn[0]),
    )[:seed_size]
    cur = dict(chars) | dict(multi)
    for _ in range(n_rounds):
        total = sum(cur.values())
        logp = {p: math.log(c / total) for p, c in cur.items() if c > 0}
        nxt: dict[str, int] = {}
        for w, c in word_counts.items():
            seg = viterbi_segment(w, logp, max_len)
            if not seg:
                continue
            for p in seg:
                nxt[p] = nxt.get(p, 0) + c
        cur = nxt
        for ch in chars:
            cur.setdefault(ch, 0)
    kept_chars = [(p, c) for p, c in sorted(cur.items()) if len(p) == 1 and c > 0]
    kept_multi = sorted(
        ((p, c) for p, c in cur.items() if len(p) >= 2 and c > 0),
        key=lambda pc: (-pc[1], pc[0]),
    )[: max(0, vocab_size - len(kept_chars))]
    final = kept_chars + kept_multi
    total = sum(c for _p, c in final)
    ranked = sorted(final, key=lambda pc: (-pc[1], pc[0]))
    return [
        (r, p, c, round(math.log(c / total), 6))
        for r, (p, c) in enumerate(ranked)
    ]


def test_viterbi_prefers_higher_prob_then_fewer_pieces():
    logp = {"a": -1.0, "b": -1.0, "ab": -1.5, "abab": -2.0}
    # abab as one piece: -2.0 beats ab+ab (-3.0) and a+b+a+b (-4.0)
    assert viterbi_segment("abab", logp, 4) == ("abab",)
    # exact tie between ab (-2.0) and a+b (-2.0): fewer pieces wins
    logp2 = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert viterbi_segment("ab", logp2, 4) == ("ab",)
    # no cover -> None
    assert viterbi_segment("xyz", {"x": -1.0}, 4) is None


def test_unigram_train_matches_pure_python_replay(spark):
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words_df = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where((F.col("word") != "") & F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    got = unigram_train(words_df, n_rounds=3, max_len=4, seed_size=50,
                        vocab_size=40)
    wc = {r["word"]: int(r["cnt"]) for r in words_df.collect()}
    want = _reference_unigram(wc, 3, 4, 50, 40)
    assert got == want
    # shape sanity: multi-char pieces actually learned mass
    assert any(len(p) >= 2 for _r, p, _c, _l in got)
    assert len(got) <= 40


def test_unigram_train_partitioning_invariant(spark):
    sf_dir = "/root/testdata/sf0.001"
    """Repartitioning the word relation must not change the learned
    vocab (integer counts + deterministic tie-breaks)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words_df = (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where((F.col("word") != "") & F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    a = unigram_train(words_df, n_rounds=2, seed_size=30, vocab_size=30)
    b = unigram_train(
        words_df.repartition(13), n_rounds=2, seed_size=30, vocab_size=30
    )
    assert a == b
