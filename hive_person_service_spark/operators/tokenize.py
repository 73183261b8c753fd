"""Byte-pair-encoding tokenizer over a DataFrame text column.

A real (if small) BPE: a fixed, deterministic merge table (rank-ordered
pair merges, the artifact a tokenizer trainer would produce) applied with
the standard greedy lowest-rank-first loop per word -- the same algorithm
GPT-2's tokenizer uses, minus byte-level pretokenization. Runs as an
Arrow-batched mapInPandas: the merge loop is inherently iterative (each
merge changes adjacency), so this is the documented Python-UDF exception --
batched, per-row independent, linear in corpus bytes, trivially parallel.

The merge table is tuned to the fixture vocabulary (SURVEY.md fixtures:
31 lowercase words) so merges actually fire; swap in a learned table for a
real deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Rank-ordered merges (lower rank merges first), tuned so common fixture
# words ('the', 'scan', 'and', 'value', ...) compress to 1-2 tokens.
MERGES: list[tuple[str, str]] = [
    ("t", "h"),
    ("th", "e"),
    ("a", "n"),
    ("s", "c"),
    ("sc", "an"),
    ("v", "a"),
    ("l", "u"),
    ("va", "lu"),
    ("valu", "e"),
    ("r", "o"),
    ("ro", "w"),
    ("d", "a"),
    ("da", "t"),
    ("dat", "a"),
    ("k", "e"),
    ("ke", "y"),
    ("j", "o"),
    ("jo", "i"),
    ("joi", "n"),
    ("an", "d"),
]

_RANKS: dict[tuple[str, str], int] = {p: i for i, p in enumerate(MERGES)}

# Deterministic vocabulary: single chars a-z get ids 0..25, then one id per
# merge product in rank order.
_VOCAB: dict[str, int] = {chr(c): c - ord("a") for c in range(ord("a"), ord("z") + 1)}
for _a, _b in MERGES:
    _VOCAB.setdefault(_a + _b, len(_VOCAB))

BPE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_chars", LongType()),
        StructField("n_bpe_tokens", LongType()),
        StructField("preview_ids", StringType()),  # first 12 ids, '-'-joined
    ]
)


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int] | None = None
                    ) -> list[str]:
    """Greedy BPE: repeatedly merge the present pair with the lowest rank
    until no mergeable pair remains. Returns the token strings."""
    ranks = _RANKS if ranks is None else ranks
    toks = list(word)
    while len(toks) > 1:
        pairs = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
        best = min(
            (p for p in pairs if p in ranks), key=ranks.__getitem__, default=None
        )
        if best is None:
            break
        merged: list[str] = []
        i = 0
        while i < len(toks):
            if i < len(toks) - 1 and (toks[i], toks[i + 1]) == best:
                merged.append(toks[i] + toks[i + 1])
                i += 2
            else:
                merged.append(toks[i])
                i += 1
        toks = merged
    return toks


def bpe_encode_text(text: str) -> list[int]:
    """Encode whitespace-split text to vocabulary ids (unknown chars are
    skipped; the fixture corpus is pure lowercase a-z + spaces)."""
    ids: list[int] = []
    for word in text.split(" "):
        for tok in bpe_encode_word(word):
            if tok in _VOCAB:
                ids.append(_VOCAB[tok])
    return ids


def bpe_encode(docs: DataFrame) -> DataFrame:
    """Arrow-batched BPE encoding of the text column: per-doc token count
    plus a preview of the first 12 ids (full id arrays would be the real
    output; the count + prefix keeps the declared result hash-stable and
    small)."""

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n_tok, preview = [], []
            for t in pdf["text"]:
                ids = bpe_encode_text(t)
                n_tok.append(len(ids))
                preview.append("-".join(str(i) for i in ids[:12]))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_chars": pdf["text"].str.len().astype("int64"),
                    "n_bpe_tokens": pd.Series(n_tok, dtype="int64"),
                    "preview_ids": preview,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(encode, BPE_SCHEMA)


def bpe_train(
    words,  # DataFrame(word string, cnt long)
    n_merges: int = 10,
) -> list[tuple[int, str, str, int]]:
    """Learn a BPE merge table FROM data, distributed: per iteration,
    count adjacent symbol pairs across the (Zipf-bounded) word-count
    relation with one groupBy, take the arg-max pair (count desc, then
    lexicographic -- fully deterministic), and apply the merge
    left-to-right non-overlapping inside every word via a JVM aggregate()
    fold (no Python in the data path; the fold carries one pending symbol
    through the array). Returns [(step, sym_a, sym_b, pair_count)].

    The driver sees ONE ROW per iteration (the winning pair) -- the same
    bounded per-round reduction the pagerank loop uses; corpus bytes
    never leave the executors. State is re-cached per round and the
    lineage cut every 4 merges (localCheckpoint) so plan depth stays
    constant however many merges are trained. The fixed-table encoder
    above (bpe_encode) is the serving-side twin; this is the training
    side a tokenizer pipeline runs first."""
    from pyspark.sql import functions as F

    state = words.select(
        "word",
        "cnt",
        F.expr("filter(split(word, ''), x -> x <> '')").alias("syms"),
    ).cache()
    merges: list[tuple[int, str, str, int]] = []
    for step in range(n_merges):
        pairs = (
            state.where(F.size("syms") >= 2)
            .select(
                "cnt",
                F.explode(
                    F.expr(
                        "zip_with(slice(syms, 1, size(syms) - 1),"
                        " slice(syms, 2, size(syms) - 1),"
                        " (a, b) -> named_struct('a', a, 'b', b))"
                    )
                ).alias("p"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
            .orderBy(F.col("n").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not pairs:
            break
        a, b, n = pairs[0]["a"], pairs[0]["b"], int(pairs[0]["n"])
        merges.append((step, a, b, n))
        qa, qb = a.replace("'", "\\'"), b.replace("'", "\\'")
        fold = (
            "aggregate(syms,"
            " named_struct('arr', cast(array() as array<string>),"
            "              'carry', cast(null as string)),"
            " (acc, x) -> if(acc.carry is null,"
            "   named_struct('arr', acc.arr, 'carry', x),"
            f"  if(acc.carry = '{qa}' and x = '{qb}',"
            f"     named_struct('arr', array_append(acc.arr, '{qa}{qb}'),"
            "                   'carry', cast(null as string)),"
            "      named_struct('arr', array_append(acc.arr, acc.carry),"
            "                   'carry', x))),"
            " acc -> if(acc.carry is null, acc.arr,"
            "           array_append(acc.arr, acc.carry)))"
        )
        nxt = state.select("word", "cnt", F.expr(fold).alias("syms"))
        if step % 4 == 3:
            nxt = nxt.localCheckpoint(eager=True)
        else:
            nxt = nxt.cache()
        state.unpersist()
        state = nxt
    state.unpersist()
    return merges
