"""WordPiece training pins (operators/tokenize.py round 9): the
distributed trainer (likelihood-scored merges, ## continuation pieces,
top-8 window + exact integer re-rank) replayed in pure Python over the
same word counts must produce the identical merge table row for row --
the text_bpe_train / text_unigram_train certification recipe."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_person_service_spark.operators.tokenize import (
    wordpiece_encode_word,
    wordpiece_train,
    wp_merged,
    wp_select_best,
)


def _reference_wordpiece(word_counts: dict[str, int], n_merges: int):
    """Pure-Python replay of wordpiece_train's orchestration (the
    selection rule is the SHARED wp_select_best definition, including
    the top-8-by-double-score candidate window)."""
    state = {
        w: tuple(w[0]) + tuple("##" + c for c in w[1:])
        for w in word_counts
    }
    merges = []
    while len(merges) < n_merges:
        pair_n: dict[tuple[str, str], int] = {}
        sym_n: dict[str, int] = {}
        for w, c in word_counts.items():
            syms = state[w]
            for s in syms:
                sym_n[s] = sym_n.get(s, 0) + c
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_n[p] = pair_n.get(p, 0) + c
        if not pair_n:
            break
        cands = [
            (a, b, n, sym_n[a], sym_n[b]) for (a, b), n in pair_n.items()
        ]
        # the distributed trainer ranks by double score then (a, b) and
        # collects the top-8 window before the exact integer re-rank
        cands.sort(key=lambda t: (-(t[2] / (t[3] * t[4])), t[0], t[1]))
        a, b, n, na, nb = wp_select_best(cands[:8])
        merged = wp_merged(a, b)
        merges.append((len(merges), a, b, merged, n, na, nb))
        for w in state:
            syms = state[w]
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            state[w] = tuple(out)
    return merges


def _words_df(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return (
        docs.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where((F.col("word") != "") & F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


def test_wordpiece_matches_pure_python_replay(spark):
    words_df = _words_df(spark)
    word_counts = {r["word"]: int(r["cnt"]) for r in words_df.collect()}
    got = wordpiece_train(words_df, n_merges=10)
    want = _reference_wordpiece(word_counts, n_merges=10)
    assert got == want
    assert len(got) == 10
    # continuation pieces actually participate: some merge touches ##
    assert any(b.startswith("##") for _s, _a, b, *_ in got)


def test_wordpiece_partitioning_invariance(spark):
    words_df = _words_df(spark)
    a = wordpiece_train(words_df.repartition(7), n_merges=6)
    b = wordpiece_train(words_df.repartition(2, "word"), n_merges=6)
    assert a == b


def test_wordpiece_score_beats_raw_count():
    """The likelihood score must pick a rarer-but-cohesive pair over the
    most frequent one: ('x','##y') occurs 5x with rare symbols, while
    ('t','##h') occurs 9x but both symbols are everywhere."""
    cands = [
        ("t", "##h", 9, 100, 90),   # score 0.001
        ("x", "##y", 5, 6, 5),      # score 0.1667 -- wins
    ]
    assert wp_select_best(cands)[:2] == ("x", "##y")


def test_wp_select_best_integer_ties_lexicographic():
    cands = [
        ("b", "##b", 2, 4, 4),  # score 1/8
        ("a", "##a", 2, 4, 4),  # same score, lex smaller -- wins
    ]
    assert wp_select_best(cands)[:2] == ("a", "##a")


def test_greedy_longest_match_scoring():
    vocab = {"u", "##n", "##a", "##f", "##fa", "##ble", "un", "unaf",
             "##ord", "b", "l", "e"}
    assert wordpiece_encode_word("unaffable", vocab) == (
        "unaf", "##fa", "##ble",
    )
    # position 0 must use a non-## piece
    assert wordpiece_encode_word("na", {"##n", "##a", "n", "##a"}) is None or \
        wordpiece_encode_word("na", {"n", "##a"}) == ("n", "##a")
    # no cover -> None ([UNK])
    assert wordpiece_encode_word("xyz", {"x", "##y"}) is None


def test_wp_merged_folds_continuation():
    assert wp_merged("a", "##b") == "ab"
    assert wp_merged("##a", "##b") == "##ab"
    assert wp_merged("un", "##af") == "unaf"
