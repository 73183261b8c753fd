"""Sequence packing: group documents into fixed-token-budget training
sequences (the step between a deduped corpus and a tokenized training run;
greedy first-fit, the standard practical packer).

Distributed shape: range-partition by doc id, sort within partitions, then
one greedy pass per partition inside mapInPandas -- no global state, no
driver loop, and pack ids are (partition, local counter) so they never
collide. Packing quality loses only at partition seams (≤ one underfull
pack per partition); at 100 TB that is noise, and the alternative -- a
global greedy -- is inherently sequential.

Determinism: repartitionByRange + sortWithinPartitions pin both membership
and order for a fixed partition count, so the same input yields the same
packs (pytest-pinned).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_PACK_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("pack_id", StringType()),
        StructField("n_tokens", LongType()),
    ]
)


def pack_documents(
    docs: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> DataFrame:
    """(doc_id, pack_id, n_tokens): every doc assigned to exactly one pack;
    no pack exceeds ``budget`` unless a single document alone does (an
    over-budget doc gets a singleton pack -- truncation is the tokenizer's
    call, not the packer's)."""
    from pyspark import TaskContext

    def greedy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pid = TaskContext.get().partitionId()
        local = 0
        used = 0
        out_ids: list[int] = []
        out_packs: list[str] = []
        out_toks: list[int] = []
        started = False
        for pdf in batches:
            for doc, tok in zip(pdf[id_col], pdf[token_col]):
                tok = int(tok)
                if started and used + tok > budget:
                    local += 1
                    used = 0
                started = True
                used += tok
                out_ids.append(int(doc))
                out_packs.append(f"p{pid}_{local}")
                out_toks.append(tok)
        if out_ids:
            yield pd.DataFrame(
                {"doc_id": out_ids, "pack_id": out_packs, "n_tokens": out_toks}
            )

    return (
        docs.select(F.col(id_col), F.col(token_col).cast("long"))
        .repartitionByRange(num_partitions, id_col)
        .sortWithinPartitions(id_col)
        .mapInPandas(greedy, _PACK_SCHEMA)
    )
