"""Tests for the BPE tokenizer and WAV-header multimodal operators
(rows-only surfaces: pytest is their correctness gate)."""

from __future__ import annotations

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.multimodal import (
    make_wav_header,
    synth_wav_assets,
    wav_meta,
)
from hive_person_service_spark.operators.tokenize import (
    bpe_encode,
    bpe_encode_text,
    bpe_encode_word,
)
from hive_person_service_spark.sources import load_table


def test_bpe_merges_fire():
    # 'the' fully merges (t+h -> th, th+e -> the); 'scan' -> sc+an -> scan
    assert bpe_encode_word("the") == ["the"]
    assert bpe_encode_word("scan") == ["scan"]
    assert bpe_encode_word("value") == ["value"]
    # un-merged words fall back to characters (greedy, never fails)
    assert bpe_encode_word("xyz") == ["x", "y", "z"]
    # lowest-rank-first greediness: 'and' merges a+n (rank 2) before n+d,
    # then an+d (rank 19) -> single token
    assert bpe_encode_word("and") == ["and"]


def test_bpe_spark_matches_reference(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(100)
    got = {r.doc_id: r for r in bpe_encode(docs).collect()}
    for row in docs.select("doc_id", "text").collect():
        ids = bpe_encode_text(row.text)
        r = got[row.doc_id]
        assert r.n_bpe_tokens == len(ids)
        assert r.preview_ids == "-".join(str(i) for i in ids[:12])
        # BPE never produces more tokens than characters
        assert r.n_bpe_tokens <= r.n_chars


def test_wav_header_roundtrip_spark(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(64)
    meta = {r.asset_id: r for r in wav_meta(synth_wav_assets(docs)).collect()}
    assert len(meta) == 64
    for i, r in meta.items():
        rate = 8000 + (i % 5) * 4000
        n = 1000 + (i * 37) % 50000
        assert (r.sample_rate, r.channels, r.bits) == (rate, 1, 16)
        assert r.n_samples == n
        assert r.duration_ms == n * 1000 // rate


def test_wav_parser_rejects_garbage(spark):
    import pandas as pd

    from hive_person_service_spark.operators.multimodal import ASSET_SCHEMA

    bad = spark.createDataFrame(
        pd.DataFrame(
            {
                "asset_id": [1, 2],
                "blob": [b"not a wav at all", make_wav_header(16000, 100)],
                "media_type": ["audio/wav"] * 2,
                "width": pd.Series([None, None], dtype="object"),
                "height": pd.Series([None, None], dtype="object"),
            }
        ),
        ASSET_SCHEMA,
    )
    rows = {r.asset_id: r for r in wav_meta(bad).collect()}
    assert rows[1].sample_rate == -1  # flagged, not crashed
    assert rows[2].sample_rate == 16000 and rows[2].n_samples == 100
