"""HNSW graph ANN tier (Malkov & Yashunin 2016, public algorithm) --
the serving-side alternative the round-4 verdict listed alongside the
IVF/PQ scan tiers: single-digit-ms per-query lookup against an in-memory
navigable small-world graph.

Spark-first shape -- SHARD-PARALLEL graphs: each partition builds an
HNSW over its own vectors inside one Arrow-batched ``mapInPandas`` pass
and answers the query locally; the global answer is the relational
top-k over the union of shard candidates (a tiny (shards x k) relation).
This is the standard "IndexShards" serving pattern: graph build is
embarrassingly parallel, per-shard memory is bounded by the partition,
and query fan-out/merge is exactly a distributed top-k. Recall is that
of single-graph HNSW (each shard searches ALL its vectors' graph; the
merge is lossless), so the quality knob stays ef.

Determinism: node levels derive from a seeded per-id hash (not RNG
state), so the same corpus partitioning always builds the same graphs
and the declared query is stable run-to-run.

Pure numpy/stdlib; cosine similarity on L2-normalized vectors (the
fixture contract) via dot products.
"""

from __future__ import annotations

import hashlib
import heapq
import math

import numpy as np


class HNSW:
    """Minimal, deterministic HNSW over a fixed corpus matrix."""

    def __init__(self, m: int = 8, ef_construction: int = 64, seed: int = 42):
        self.m = m
        self.m0 = 2 * m
        self.ef_construction = ef_construction
        self.seed = seed
        self.ml = 1.0 / math.log(m)
        self.vecs: np.ndarray | None = None
        self.levels: list[int] = []
        # neighbors[layer][node] -> list[int]
        self.neighbors: list[dict[int, list[int]]] = []
        self.entry: int = -1

    # -- deterministic level sampling: hash(id, seed) -> uniform(0,1) ----
    def _level_of(self, ident: int) -> int:
        h = hashlib.blake2b(
            f"{self.seed}:{ident}".encode(), digest_size=8
        ).digest()
        u = (int.from_bytes(h, "big") + 1) / float(1 << 64)
        return int(-math.log(u) * self.ml)

    def _sim(self, q: np.ndarray, idx) -> np.ndarray:
        return self.vecs[idx] @ q

    def _search_layer(self, q, eps: list[int], ef: int, layer: int) -> list[int]:
        """Best-first search; returns up to ef nodes, most-similar first."""
        visited = set(eps)
        cand: list[tuple[float, int]] = []  # max-heap by sim (neg stored)
        best: list[tuple[float, int]] = []  # min-heap of kept sims
        for e in eps:
            s = float(self.vecs[e] @ q)
            heapq.heappush(cand, (-s, e))
            heapq.heappush(best, (s, e))
            if len(best) > ef:
                heapq.heappop(best)
        while cand:
            s_neg, c = heapq.heappop(cand)
            if best and -s_neg < best[0][0] and len(best) >= ef:
                break
            for nb in self.neighbors[layer].get(c, ()):
                if nb in visited:
                    continue
                visited.add(nb)
                s = float(self.vecs[nb] @ q)
                if len(best) < ef or s > best[0][0]:
                    heapq.heappush(cand, (-s, nb))
                    heapq.heappush(best, (s, nb))
                    if len(best) > ef:
                        heapq.heappop(best)
        return [n for _s, n in sorted(best, reverse=True)]

    def build(self, vecs: np.ndarray) -> "HNSW":
        self.vecs = np.asarray(vecs, dtype=np.float64)
        n = len(self.vecs)
        self.levels = [self._level_of(i) for i in range(n)]
        top = max(self.levels, default=0)
        self.neighbors = [dict() for _ in range(top + 1)]
        for i in range(n):
            self._insert(i)
        return self

    def _insert(self, i: int) -> None:
        li = self.levels[i]
        q = self.vecs[i]
        if self.entry < 0:
            self.entry = i
            for layer in range(li + 1):
                self.neighbors[layer][i] = []
            return
        ep = [self.entry]
        ltop = self.levels[self.entry]
        for layer in range(ltop, li, -1):
            ep = self._search_layer(q, ep, 1, layer)[:1]
        for layer in range(min(li, ltop), -1, -1):
            mmax = self.m0 if layer == 0 else self.m
            cands = self._search_layer(q, ep, self.ef_construction, layer)
            chosen = cands[: self.m]
            self.neighbors[layer][i] = list(chosen)
            for c in chosen:
                lst = self.neighbors[layer].setdefault(c, [])
                lst.append(i)
                if len(lst) > mmax:  # prune to the mmax most-similar
                    sims = self._sim(self.vecs[c], lst)
                    order = np.argsort(-sims)[:mmax]
                    self.neighbors[layer][c] = [lst[j] for j in order]
            ep = cands
        if li > self.levels[self.entry]:
            self.entry = i

    def search(self, q: np.ndarray, k: int = 10, ef: int = 64) -> list[tuple[int, float]]:
        """Top-k (index, cosine) most similar to q. ``ef >= n`` engages
        EXHAUSTIVE mode: the layer-0 search is seeded with every node, so
        the result is exactly the brute-force top-k by construction --
        graph reachability is NOT relied on (bidirectional-edge pruning
        during insert can orphan a node's incoming edges, so an
        ef-of-everything beam over the graph alone would not be a
        guarantee)."""
        if self.entry < 0:
            return []
        q = np.asarray(q, dtype=np.float64)
        if ef >= len(self.vecs):
            ep = list(range(len(self.vecs)))
        else:
            ep = [self.entry]
            for layer in range(self.levels[self.entry], 0, -1):
                ep = self._search_layer(q, ep, 1, layer)[:1]
        found = self._search_layer(q, ep, max(ef, k), 0)[:k]
        return [(int(i), float(self.vecs[i] @ q)) for i in found]


def hnsw_shard_topk(
    emb,
    query_vec: np.ndarray,
    k: int = 10,
    m: int = 8,
    ef: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    ef_construction: int | None = None,
):
    """Distributed HNSW query: each partition builds its shard graph and
    answers locally (Arrow-batched, zero shuffle); the global answer is
    the relational top-k over the (shards x k) candidate union. Returns
    a DataFrame (id_col, cos, rank).

    ``ef_construction`` defaults to max(ef, 2m) but can be set
    independently: a huge SEARCH ef (the exhaustive-exactness mode) does
    not require a huge BUILD ef -- insertion links every new node
    bidirectionally into the entry point's component, so the graph is
    connected by construction at ANY ef_construction, and an ef >= shard
    size beam therefore visits every node."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    q = np.asarray(query_vec, dtype=np.float64)

    def shard_search(batches):
        ids: list[int] = []
        vecs: list = []
        for pdf in batches:
            ids.extend(int(x) for x in pdf[id_col])
            vecs.extend(np.array(list(pdf[vec_col]), dtype=np.float64))
        if not ids:
            return
        efc = ef_construction if ef_construction is not None else max(ef, 2 * m)
        index = HNSW(m=m, ef_construction=max(efc, 2 * m)).build(np.array(vecs))
        hits = index.search(q, k=k, ef=ef)
        yield pd.DataFrame(
            {
                id_col: [ids[i] for i, _ in hits],
                "cos": [round(s, 6) for _, s in hits],
            }
        )

    local = emb.select(id_col, vec_col).mapInPandas(
        shard_search, f"{id_col} long, cos double"
    )
    w = Window.orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        local.orderBy(F.col("cos").desc(), id_col)
        .limit(k)
        .withColumn("rank", F.row_number().over(w).cast("long"))
    )
