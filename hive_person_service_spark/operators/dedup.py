"""Deduplication operators for the LLM-data-pipeline surface (SURVEY.md
§2.J): exact, MinHash+LSH near-dup, SimHash.

100 TB design: nothing here ever cross-joins the corpus. Candidate
generation is banding + groupBy(band hash) -- join fan-out is bounded by
bucket sizes -- and only candidates pay the exact-Jaccard verification.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import shingles_expr, tokens_expr


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per distinct text (deterministic, unlike
    dropDuplicates). One shuffle on the text hash."""
    w = Window.partitionBy(text_col).orderBy(id_col)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop(
        "__rn"
    )


def doc_shingles(df: DataFrame, n: int = 3, id_col: str = "doc_id") -> DataFrame:
    """(id, shingle) exploded distinct word n-gram shingles per document."""
    return df.select(
        F.col(id_col),
        F.explode(shingles_expr(tokens_expr(), n)).alias("shingle"),
    )


_MERSENNE_31 = (1 << 31) - 1


def _perm_constants(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash constants (a, b), a != 0, mod 2^31-1."""
    rng = random.Random(7)
    return [
        (rng.randrange(1, _MERSENNE_31), rng.randrange(0, _MERSENNE_31))
        for _ in range(num_perm)
    ]


def minhash_signatures(
    shingled: DataFrame, num_perm: int = 32, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature per document: one base hash per shingle, then
    num_perm universal-hash permutations sig_j = min((a_j*h + b_j) mod
    (2^31-1)) -- 1 hash + num_perm mul-adds per row instead of num_perm
    full hash calls. All arithmetic stays under 2^62 (ANSI mode on Spark 4
    makes silent wrap-around an error, so the classic overflow trick is
    off the table). One pass, one shuffle, map-side partial min."""
    h = F.pmod(F.xxhash64(F.col("shingle")), F.lit(_MERSENNE_31))
    aggs = [
        F.min(F.pmod(F.lit(a) * h + F.lit(b), F.lit(_MERSENNE_31))).alias(f"sig_{j}")
        for j, (a, b) in enumerate(_perm_constants(num_perm))
    ]
    return shingled.groupBy(id_col).agg(*aggs)


def minhash_signatures_inrow(
    docs: DataFrame, num_perm: int = 32, shingle_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signatures with ZERO shuffle: the shingle set never leaves
    the row -- base hashes via transform over the in-row array, each
    permutation an array_min over a mul-add transform. Produces signatures
    identical to minhash_signatures (same constants, same arithmetic), but
    replaces the exploded shingle relation's groupBy (a full shuffle of
    ~200x the corpus row count) with per-row expression work: the map-side-
    only shape you want when signatures are all you need. Documents too
    short to have a single shingle are dropped, mirroring the grouped
    variant (they produce no exploded rows there).

    Computed as ONE fold over the shingle array (F.aggregate with a
    num_perm-wide accumulator: per shingle, zip_with the permuted hashes
    against the running mins) instead of num_perm separate array
    traversals -- measured 2.3x faster at sf0.1 (1.9s vs 4.5s cold) with
    bit-identical output.

    When to use which: this variant wins when signatures are the main
    cost (signature-index builds, incremental new-batch fingerprinting,
    the candidate-verify pipeline in near_duplicates_minhash_inrow, or a
    cluster where the shingle shuffle -- ~200x corpus rows -- dominates);
    grouped signatures win only when the exploded shingle relation is
    persisted for other consumers anyway."""
    consts = _perm_constants(num_perm)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in consts])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in consts])
    acc0 = F.array(*[F.lit(_MERSENNE_31).cast("long") for _ in range(num_perm)])
    m = F.lit(_MERSENNE_31)
    sh = F.array_distinct(shingles_expr(tokens_expr(), shingle_n))
    # Hash each shingle ONCE into _hs (HOF lambdas get no common-
    # subexpression elimination -- hashing inside the fold would cost
    # num_perm hash calls per shingle), then fold the mul-add mins.
    hs = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), m))
    # Guard on the CHEAP equivalent predicate (shingles are empty iff the
    # doc has < n tokens): a guard on size(_hs) gets predicate-pushed below
    # the caller's repartition with the whole shingling expression
    # substituted in -- serializing the hash work into the (often
    # single-task) scan stage and computing it twice.
    base = docs.where(F.size(tokens_expr()) >= shingle_n).select(
        F.col(id_col), hs.alias("_hs")
    )
    sig = F.aggregate(
        F.col("_hs"),
        acc0,
        lambda acc, h: F.zip_with(
            F.zip_with(a_arr, b_arr, lambda a, b: F.pmod(a * h + b, m)),
            acc,
            lambda x, y: F.least(x, y),
        ),
    )
    # Two projections on purpose: referencing the fold once under an alias
    # keeps CollapseProject from inlining one copy of the whole aggregate
    # into each of the num_perm output columns (it only duplicates cheap
    # expressions; a HOF fold is not one).
    return base.select(F.col(id_col), sig.alias("_sig")).select(
        F.col(id_col),
        *[
            F.element_at("_sig", j + 1).alias(f"sig_{j}")
            for j in range(num_perm)
        ],
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding: hash each band of rows_per_band signature slots, then
    self-join *within* (band_id, band_hash) buckets -> candidate (a, b)
    pairs, a < b, distinct.

    Scale shape: explode to bands (xN rows), groupBy-join on the band key --
    fan-out bounded by bucket size; skewed buckets (boilerplate text) split
    by AQE skew-join. Never a corpus cross-join.
    """
    rows_per_band = num_perm // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(
                *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("band_hash"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(
        id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_hash") == F.col("b.band_hash"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def verify_jaccard(
    candidates: DataFrame, shingled: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Exact Jaccard for candidate pairs only: join each side's shingle set,
    count intersections, divide by union size."""
    counts = shingled.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    sa = shingled.select(F.col(id_col).alias("id_a"), "shingle")
    sb = shingled.select(F.col(id_col).alias("id_b"), "shingle")
    shared = (
        candidates.join(sa, "id_a")
        .join(sb, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared"))
    )
    ca = counts.select(F.col(id_col).alias("id_a"), F.col("n_shingles").alias("n_a"))
    cb = counts.select(F.col(id_col).alias("id_b"), F.col("n_shingles").alias("n_b"))
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
            ).alias("jaccard"),
        )
    )


# Bounded plan-outliving caches: one live relation per slot, previous
# cache dropped when the plan changes, kept when identical (so repeated
# identical queries still hit it). Shared implementation in
# operators/caching.py (r12: plan-level persists use it too).
from .caching import persist_bounded as _persist_bounded  # noqa: E402


def near_duplicates_minhash(
    df: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> minhash -> band ->
    bucket-join -> exact-Jaccard verify -> threshold filter.

    The shingle relation feeds three consumers (signatures + both sides of
    the verify join), so it is persisted -- without it Spark re-scans and
    re-shingles the corpus per consumer. At 100 TB the same role is played
    by materializing shingles to a parquet staging table. Measured (sf0.1,
    warm): grouped signatures over the persisted shingles beat the
    zero-shuffle in-row variant here (3.0s vs 4.2s end-to-end) because the
    shingle relation is needed by the verify join anyway -- use
    minhash_signatures_inrow only when signatures are the SOLE consumer."""
    # Fan the (narrow) doc rows across all cores before the wide explode --
    # a single-row-group parquet file otherwise pins shingling to one task.
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    shingled = _persist_bounded("minhash_shingled", doc_shingles(df, n=shingle_n))
    sigs = minhash_signatures(shingled, num_perm=num_perm)
    cands = lsh_candidate_pairs(sigs, num_perm=num_perm, bands=bands)
    return verify_jaccard(cands, shingled).where(F.col("jaccard") >= threshold)


def near_duplicates_minhash_inrow(
    df: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, candidate-verify formulation: in-row
    signatures (zero shuffle -- the shingle set never leaves the row) ->
    banding/bucket join -> exact-Jaccard verify that shingles ONLY the
    documents appearing in some candidate pair.

    Same output contract as near_duplicates_minhash (identical signature
    arithmetic/constants, same banding), different cost shape: the grouped
    pipeline shuffles the full exploded shingle relation (~200x corpus
    rows) once for signatures and keeps it persisted for verification; this
    one never shuffles shingles at all and pays corpus-wide work only as
    per-row expression evaluation. Verification cost scales with the
    candidate set, not the corpus -- the shape you want when near-dups are
    sparse (every real training corpus) and on cold sessions where the
    grouped path's persist never amortizes. Measured sf0.1 cold: 3.4s vs
    11.7s for the grouped form."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    # vectorized fold (bit-identical signatures; see
    # minhash_signatures_inrow_vec / _fold_min_perms_arrow); persisted
    # because the band self-join scans the signature relation twice (the
    # md5 variant's discipline)
    sigs = _persist_bounded(
        "minhash_inrow_sigs",
        minhash_signatures_inrow_vec(df, num_perm=num_perm,
                                     shingle_n=shingle_n),
    )
    cands = _persist_bounded(
        "minhash_inrow_cands",
        lsh_candidate_pairs(sigs, num_perm=num_perm, bands=bands),
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionAll(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = df.join(cand_ids, "doc_id", "left_semi")
    shingled = doc_shingles(cand_docs, n=shingle_n)
    return verify_jaccard(cands, shingled).where(F.col("jaccard") >= threshold)


def near_duplicates_incremental(
    new_docs: DataFrame,
    corpus_shingled: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Continuous-ingest near-dup: check NEW documents against an EXISTING
    corpus without re-hashing the corpus. ``corpus_shingled`` is the stored
    (id, shingle) relation (at 100 TB: a parquet staging table maintained
    by the ingest pipeline; signatures/bands derive from it once per batch).

    Returns (id_a=corpus doc, id_b=new doc) pairs over the threshold. The
    corpus side is touched only through band-bucket joins + candidate
    verification -- cost scales with the new batch, not the corpus.
    """
    new_shingled = _persist_bounded(
        "incremental_new_shingled", doc_shingles(new_docs, n=shingle_n)
    )
    new_sigs = minhash_signatures(new_shingled, num_perm=num_perm)
    corpus_sigs = minhash_signatures(corpus_shingled, num_perm=num_perm)

    def banded(sigs: DataFrame, out_id: str) -> DataFrame:
        rows_per_band = num_perm // bands
        cols = [
            F.struct(
                F.lit(b).alias("band_id"),
                F.xxhash64(
                    *[F.col(f"sig_{b * rows_per_band + r}") for r in range(rows_per_band)]
                ).alias("band_hash"),
            )
            for b in range(bands)
        ]
        return sigs.select(
            F.col("doc_id").alias(out_id), F.explode(F.array(*cols)).alias("band")
        ).select(out_id, "band.band_id", "band.band_hash")

    cands = (
        banded(corpus_sigs, "id_a")
        .join(banded(new_sigs, "id_b"), ["band_id", "band_hash"])
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    both = corpus_shingled.unionByName(new_shingled)
    return verify_jaccard(cands, both).where(F.col("jaccard") >= threshold)


def simhash_signatures(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document over distinct tokens, emitted as two
    32-bit halves (simhash_lo = bits 0..31, simhash_hi = bits 32..63) to
    stay in non-negative long range.

    Per token: h = xxhash64(token); bit i contributes +1 if set else -1;
    signature bit i = (sum_i > 0). Single explode + one groupBy with 64
    conditional-sum expressions (map-side partial aggregation).
    """
    tok = df.select(F.col(id_col), F.explode(F.array_distinct(tokens_expr())).alias("token"))
    h = F.xxhash64(F.col("token"))
    sums = [
        F.sum(
            F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"s_{i}")
        for i in range(64)
    ]
    agg = tok.groupBy(id_col).agg(*sums)
    lo = None
    hi = None
    for i in range(32):
        bit_lo = F.when(F.col(f"s_{i}") > 0, F.lit(1 << i)).otherwise(0)
        bit_hi = F.when(F.col(f"s_{i + 32}") > 0, F.lit(1 << i)).otherwise(0)
        lo = bit_lo if lo is None else lo + bit_lo
        hi = bit_hi if hi is None else hi + bit_hi
    return agg.select(
        id_col, lo.cast("long").alias("simhash_lo"), hi.cast("long").alias("simhash_hi")
    )


def contamination_flags(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag corpus docs sharing any word n-gram
    with the benchmark set (the train/test-overlap gate every training-data
    pipeline runs before shipping a corpus).

    Shape: shingle both sides, semi-join on the shingle (inverted index --
    candidates meet through shared shingles, never a cross join), left join
    the flag back. The benchmark side is small in practice -> its distinct
    shingle set broadcasts; corpus-side shingling streams.

    n=4 suits the synthetic fixture (near-zero natural 8-gram overlap);
    production decontamination uses 8-13-gram windows on the same plumbing.
    """
    bsh = doc_shingles(benchmark, n=n, id_col=id_col).select("shingle").distinct()
    csh = doc_shingles(corpus, n=n, id_col=id_col)
    flagged = (
        csh.join(F.broadcast(bsh), "shingle")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return corpus.join(flagged, id_col, "left").withColumn(
        "contaminated", F.coalesce(F.col("contaminated"), F.lit(False))
    )


def jaccard_prefix_candidates(
    shingled: DataFrame, threshold: float = 0.5, id_col: str = "doc_id"
) -> DataFrame:
    """AllPairs/PPJoin-style prefix filtering (Bayardo et al., WWW'07;
    Xiao et al., WWW'08): order each document's shingle set by ascending
    global document frequency (rarest first); any two sets with
    Jaccard >= t MUST share a shingle within each one's first
    |set| - ceil(t * |set|) + 1 entries. Index ONLY those prefixes and
    generate candidates from the prefix inverted index.

    Why this is the scale move over the full inverted-index self-join:
    (a) the index shrinks to the prefix fraction (~(1-t) of entries);
    (b) the hottest shingles -- the skewed posting lists that dominate the
    full join's fan-out -- sort LAST and rarely land in any prefix, so the
    worst buckets never generate candidates; (c) the companion length
    filter (t*|A| <= |B|) prunes cross-size pairs before verification.
    Exact, not approximate: recall is 100% by the prefix lemma (pinned in
    pytest against the full-index join)."""
    gdf = shingled.groupBy("shingle").agg(F.count("*").alias("df"))
    ranked = shingled.join(gdf, "shingle").select(
        F.col(id_col),
        "shingle",
        F.row_number()
        .over(
            Window.partitionBy(id_col).orderBy("df", "shingle")
        )
        .alias("pos"),
        F.count("*").over(Window.partitionBy(id_col)).alias("n"),
    )
    prefix = ranked.where(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1
    )
    pa = prefix.select(
        F.col(id_col).alias("id_a"), "shingle",
        F.col("n").alias("n_a"), F.col("pos").alias("pos_a"),
    )
    pb = prefix.select(
        F.col(id_col).alias("id_b"), "shingle",
        F.col("n").alias("n_b"), F.col("pos").alias("pos_b"),
    )
    # PPJoin positional filter (Xiao et al., WWW'08 §3.2): a pair meeting
    # at prefix positions (pos_a, pos_b) can share at most
    # 1 + min(n_a - pos_a, n_b - pos_b) shingles, and Jaccard >= t needs
    # overlap >= t/(1+t) * (n_a + n_b). Keeping the pair if ANY meeting
    # passes is a superset of PPJoin's candidate set => still exact, but
    # it prunes INSIDE the bucket join, before the distinct shuffle --
    # on the sf1 degenerate-vocab corpus this is the difference between
    # a quadratic candidate blow-up and a bounded one (637s -> measured
    # below; see SCALE.md).
    min_overlap = F.ceil(
        F.lit(threshold) / (1.0 + threshold) * (F.col("n_a") + F.col("n_b"))
    )
    ubound = 1 + F.least(
        F.col("n_a") - F.col("pos_a"), F.col("n_b") - F.col("pos_b")
    )
    return (
        pa.join(pb, "shingle")
        .where(
            (F.col("id_a") < F.col("id_b"))
            # length filter: Jaccard >= t forces t*|A| <= |B| <= |A|/t
            & (F.col("n_b") >= F.lit(threshold) * F.col("n_a"))
            & (F.col("n_a") >= F.lit(threshold) * F.col("n_b"))
            & (ubound >= min_overlap)
        )
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_join_prefix(
    docs: DataFrame,
    threshold: float = 0.5,
    shingle_n: int = 3,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact threshold Jaccard self-join via prefix filtering: candidates
    from jaccard_prefix_candidates, then exact verification over the full
    shingle sets. Identical output to the full inverted-index join at the
    same threshold -- only the candidate-generation strategy differs."""
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        docs = docs.repartition(sc.defaultParallelism)
    shingled = _persist_bounded(
        "jaccard_prefix_shingled", doc_shingles(docs, n=shingle_n)
    )
    cands = jaccard_prefix_candidates(shingled, threshold=threshold, id_col=id_col)
    return verify_jaccard(cands, shingled, id_col=id_col).where(
        F.col("jaccard") >= threshold
    )


def minhash_signatures_inrow_md5(
    docs: DataFrame, num_perm: int = 32, shingle_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """In-row MinHash signatures whose base hash is ENGINE-REPRODUCIBLE:
    h = first 32 md5 bits of the shingle (mod 2^31-1), the same md5_int
    idiom the deterministic sketches use (operators/sketches.py) -- any
    engine with md5 + hex parsing computes the identical value, unlike
    xxhash64. Same fold structure / permutation constants as
    minhash_signatures_inrow; use THIS variant when the downstream
    consumer must be verifiable in another engine (the oracle-checked
    dedup_near), the xxhash one when raw speed matters (one JVM hash call
    vs an md5 + hex-parse per shingle)."""
    consts = _perm_constants(num_perm)
    a_arr = F.array(*[F.lit(a).cast("long") for a, _ in consts])
    b_arr = F.array(*[F.lit(b).cast("long") for _, b in consts])
    acc0 = F.array(*[F.lit(_MERSENNE_31).cast("long") for _ in range(num_perm)])
    m = F.lit(_MERSENNE_31)
    sh = F.array_distinct(shingles_expr(tokens_expr(), shingle_n))
    hs = F.transform(
        sh,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"), m
        ),
    )
    base = docs.where(F.size(tokens_expr()) >= shingle_n).select(
        F.col(id_col), hs.alias("_hs")
    )
    sig = F.aggregate(
        F.col("_hs"),
        acc0,
        lambda acc, h: F.zip_with(
            F.zip_with(a_arr, b_arr, lambda a, b: F.pmod(a * h + b, m)),
            acc,
            lambda x, y: F.least(x, y),
        ),
    )
    return base.select(F.col(id_col), sig.alias("_sig")).select(
        F.col(id_col),
        *[F.element_at("_sig", j + 1).alias(f"sig_{j}") for j in range(num_perm)],
    )


#: Max base hashes vectorized per numpy slab inside _fold_min_perms_arrow
#: (module-level so tests can shrink it to exercise the chunked paths).
_FOLD_SLAB = 1 << 18


def _fold_min_perms_arrow(
    hashed: DataFrame, num_perm: int, id_col: str
) -> DataFrame:
    """Turn (id, _hs array<long>) base-hash rows into MinHash signatures by
    folding the universal-hash permutations in ONE vectorized numpy stage.

    The JVM expression fold (F.aggregate + zip_with) is interpreted per
    array element -- no codegen for higher-order-function lambdas -- and
    allocates two intermediate arrays per shingle; at 32 permutations that
    interpretation dominates signature cost. Here only (id, base hashes)
    cross the Arrow boundary (a few bytes per shingle, never text), and the
    permutation mins compute as two int64 matrix ops per batch:
    (h[:, None] * A + B) % M, then a segmented min over each row's slice.
    Arithmetic is IDENTICAL to the expression fold (int64 exact, all values
    < 2^62): same constants, same mod, same mins -- bit-equal signatures.
    """
    import numpy as np
    import pyarrow as pa

    consts = _perm_constants(num_perm)
    a_np = np.array([a for a, _ in consts], dtype=np.int64)
    b_np = np.array([b for _, b in consts], dtype=np.int64)
    m = _MERSENNE_31
    out_schema = ", ".join(
        [f"{id_col} long"] + [f"sig_{j} long" for j in range(num_perm)]
    )

    # Bound the vectorization temporaries: the (hashes x num_perm) int64
    # product matrix is the big allocation (a 10k-row Arrow batch of
    # long documents can hold tens of millions of hashes -> multi-GB
    # temporaries). Fold at most _FOLD_SLAB hashes per slab (2 temporaries
    # of <= slab * num_perm int64s, ~64 MB each at num_perm=32), carrying
    # the row-segment boundaries; min-of-slab-mins == min-of-all, so the
    # signatures are bit-identical to the unchunked fold.
    _SLAB = _FOLD_SLAB

    def fold(batches):
        for batch in batches:
            ids = batch.column(0)
            hs = batch.column(1)
            if isinstance(hs, pa.ChunkedArray):  # not produced by mapInArrow,
                hs = hs.combine_chunks()         # but cheap to be safe
            # list<int64> = one contiguous values buffer + offsets; slice
            # out this batch's window (zero-copy) before vectorizing
            offs = hs.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = hs.values.to_numpy(zero_copy_only=False).astype(np.int64)
            vals = vals[offs[0]:offs[-1]]
            offs = offs - offs[0]
            if len(vals) == 0:
                continue
            n_rows = len(offs) - 1
            sigs = np.empty((n_rows, num_perm), dtype=np.int64)
            i = 0
            while i < n_rows:
                # grow [i, j) while the slab stays under budget (always
                # taking at least one row)
                j = i + 1
                while j < n_rows and offs[j + 1] - offs[i] <= _SLAB:
                    j += 1
                lo, hi = offs[i], offs[j]
                if hi - lo <= _SLAB:
                    perm = (vals[lo:hi, None] * a_np[None, :] + b_np[None, :]) % m
                    # rows are non-empty by construction (callers filter
                    # docs with fewer than n tokens), so every reduceat
                    # segment is valid
                    sigs[i:j] = np.minimum.reduceat(
                        perm, offs[i:j] - lo, axis=0
                    )
                else:
                    # one row alone exceeds the slab: running min over
                    # value-chunks of that row (same arithmetic, same min)
                    acc = np.full(num_perm, np.iinfo(np.int64).max)
                    for s in range(lo, hi, _SLAB):
                        chunk = (
                            vals[s:min(s + _SLAB, hi), None] * a_np[None, :]
                            + b_np[None, :]
                        ) % m
                        np.minimum(acc, chunk.min(axis=0), out=acc)
                    sigs[i] = acc
                i = j
            arrays = [ids] + [
                pa.array(sigs[:, j], type=pa.int64()) for j in range(num_perm)
            ]
            yield pa.RecordBatch.from_arrays(
                arrays,
                names=[id_col] + [f"sig_{j}" for j in range(num_perm)],
            )

    return hashed.mapInArrow(fold, out_schema)


def minhash_signatures_inrow_vec(
    docs: DataFrame, num_perm: int = 32, shingle_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """minhash_signatures_inrow (xxhash64 base hash) with the permutation
    fold vectorized (_fold_min_perms_arrow): bit-identical signatures to
    both the grouped and the in-row expression-fold variants -- same base
    hash, same constants, same mod arithmetic."""
    m = F.lit(_MERSENNE_31)
    sh = shingles_expr(tokens_expr(), shingle_n)
    hs = F.transform(sh, lambda s: F.pmod(F.xxhash64(s), m))
    base = docs.where(F.size(tokens_expr()) >= shingle_n).select(
        F.col(id_col), hs.alias("_hs")
    )
    return _fold_min_perms_arrow(base, num_perm, id_col)


def minhash_signatures_inrow_md5_vec(
    docs: DataFrame, num_perm: int = 32, shingle_n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """minhash_signatures_inrow_md5 with the permutation fold vectorized
    (see _fold_min_perms_arrow): base hashes stay JVM-side (codegen'd md5 +
    hex parse per DISTINCT in-row shingle), the 32-permutation min fold
    runs in numpy. Bit-identical signatures, same zero-shuffle shape -- the
    Arrow stage is map-only."""
    m = F.lit(_MERSENNE_31)
    sh = shingles_expr(tokens_expr(), shingle_n)
    hs = F.transform(
        sh,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"), m
        ),
    )
    base = docs.where(F.size(tokens_expr()) >= shingle_n).select(
        F.col(id_col), hs.alias("_hs")
    )
    return _fold_min_perms_arrow(base, num_perm, id_col)


def lsh_candidate_pairs_exact_bands(
    signatures: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH banding joined on the RAW slot tuple (as a collision-free string
    key) instead of xxhash64(band): candidate generation becomes exactly
    'some band's slots all equal', with no hash-collision false candidates
    -- which makes the WHOLE pipeline reproducible as 8 equi-joins in plain
    SQL (the dedup_near oracle). Cost shape is identical to
    lsh_candidate_pairs: explode to bands, equi-join on the band key."""
    rows_per_band = num_perm // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.concat_ws(
                ",",
                *[
                    F.col(f"sig_{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ],
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    banded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_id", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.band_id") == F.col("b.band_id"),
                F.col("a.band_key") == F.col("b.band_key"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def near_duplicates_minhash_md5(
    df: DataFrame,
    threshold: float = 0.7,
    num_perm: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, ENGINE-REPRODUCIBLE end to end: md5
    base hash -> universal-hash permutation mins (in-row, zero shuffle)
    -> raw-tuple banding -> candidate-only exact-Jaccard verify. Every
    stage is deterministic arithmetic another engine can replay, so the
    output (including which pairs banding surfaces) is fully
    oracle-checkable -- not recall-probabilistic from the oracle's view.
    Same candidate-verify cost shape as near_duplicates_minhash_inrow."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        df = df.repartition(sc.defaultParallelism)
    # persist the signatures BEFORE banding: the band self-join has two
    # scans of this relation, and unpersisted each side would recompute
    # every per-shingle md5 + 32-permutation fold (the whole signature
    # arithmetic twice -- measured ~45% of the r7 bench query).
    # The fold runs VECTORIZED (minhash_signatures_inrow_md5_vec: md5 stays
    # JVM-side, the permutation mins compute in numpy) -- bit-identical
    # signatures, measured 2.9x faster than the interpreted expression
    # fold at sf0.1 (1.36s vs 3.93s noop-sink best-of-3, r11 opt round).
    sigs = _persist_bounded(
        "minhash_md5_sigs",
        minhash_signatures_inrow_md5_vec(df, num_perm=num_perm,
                                         shingle_n=shingle_n),
    )
    cands = _persist_bounded(
        "minhash_md5_cands",
        lsh_candidate_pairs_exact_bands(sigs, num_perm=num_perm, bands=bands),
    )
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .unionAll(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    cand_docs = df.join(cand_ids, "doc_id", "left_semi")
    # persisted for the same reason as the signatures: verify_jaccard
    # joins this relation on BOTH pair sides, and it is bounded by the
    # candidate count, not the corpus
    shingled = _persist_bounded(
        "minhash_md5_shingled", doc_shingles(cand_docs, n=shingle_n)
    )
    return verify_jaccard(cands, shingled).where(F.col("jaccard") >= threshold)
