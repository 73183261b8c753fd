"""§2.J -- similarity search over the embeddings table (multimodal columns:
array<float> vectors carried through relational ops; binary blobs).

Embeddings are L2-normalized (FIXTURES.md) => cosine == dot product. All
cosines are computed in double and rounded to 6 decimals in-query so Spark
and DuckDB (list_dot_product) orderings agree; LIMIT orderings tie-break on
vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, to_double_array
from ..operators.similarity import ann_pairs_lsh
from ..sources import load_table
from .registry import declare


@declare(
    "sim_topk",
    oracle="""
    SELECT vec_id,
           ROUND(list_dot_product(
             CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6)
             AS cos
    FROM embeddings
    WHERE vec_id <> 0
    ORDER BY cos DESC, vec_id
    LIMIT 10
    """,
)
def sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 to a query vector (vec_id 0): broadcast the
    query, JVM-side zip_with/aggregate dot product, TakeOrderedAndProject."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(
        to_double_array("embedding").alias("qv")
    )
    return (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            F.round(cosine_expr(to_double_array("embedding"), F.col("qv")), 6).alias(
                "cos"
            ),
        )
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(10)
    )


@declare(
    "sim_knn_join",
    oracle="""
    SELECT a_id, b_id, cos, neighbor_rank FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS cos,
             row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                               CAST(b.embedding AS DOUBLE[])), 6) DESC,
                        b.vec_id) AS neighbor_rank
      FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
      WHERE a.vec_id < 50)
    WHERE neighbor_rank <= 3
    """,
)
def sim_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN join: top-3 neighbors for each anchor (vec_id < 50), declared on
    the IVF tier (operators/ivf.py): anchors probe cells, candidates meet
    through an equi-join on cell id -- no BroadcastNestedLoopJoin anywhere
    in the plan. Probed at nprobe == nlist the candidate set is exhaustive,
    so the result is exactly the brute-force kNN join and stays
    oracle-checkable; a 100 TB run shrinks nprobe to trade recall for
    ~nlist/nprobe less join IO. knn_join_exact remains as the small-n
    pytest oracle for the approximate settings."""
    from ..operators.ivf import build_ivf, ivf_knn_join

    emb = load_table(spark, sf_dir, "embeddings")
    # Full probe => exact under ANY cell partition: spend the minimum on
    # the KMeans index build (random init + 2 iterations; k-means|| init
    # alone is several extra passes).
    assigned, centroids = build_ivf(
        emb, nlist=16, seed=42, max_iter=2, init_mode="random"
    )
    anchors = emb.where(F.col("vec_id") < 50)
    return ivf_knn_join(anchors, assigned, centroids, k=3, nprobe=16)


@declare(
    "emb_cosine_dup",
    oracle="""
    SELECT a.vec_id AS a_id, b.vec_id AS b_id,
           ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                  CAST(b.embedding AS DOUBLE[])), 6) AS cos
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),
                                 CAST(b.embedding AS DOUBLE[])), 6) >= 0.45
    """,
)
def emb_cosine_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup candidate pairs (cos >= 0.45 -- the top
    ~1e-4 quantile of this corpus, whose max off-diagonal cosine is ~0.6; a
    corpus with verbatim dups would threshold at 0.9+), exact all-pairs
    form (oracle-checkable) via the blockwise matmul operator -- one numpy
    matmul per (stripe, tile) block pair met through an executor-side
    equi-join (no corpus bytes through the driver) instead of a non-equi
    join evaluating the dot-product expression per pair. sim_ann_pairs is
    the bucketed path once the corpus outgrows the all-block-pairs
    budget."""
    from ..operators.similarity import cosine_pairs_blockwise

    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_pairs_blockwise(spark, emb, threshold=0.45)


@declare("sim_ann_pairs", oracle=None)  # rows-only: LSH bucketing is Spark-side
def sim_ann_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN near-neighbor pairs via random-hyperplane LSH bucketing + exact
    in-bucket verification (cos >= 0.6). The 100 TB similarity path: pairs
    only form inside buckets. pytest measures recall vs the exact query."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_pairs_lsh(emb, threshold=0.6, n_planes=12)


@declare("sim_ivf_topk", oracle=None)  # rows-only: index-assisted ANN
def sim_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-indexed top-10 neighbors of vec_id 0: k-means cells + nprobe
    probing (operators/ivf.py). pytest pins recall vs the exact sim_topk
    and full-probe == exact equivalence."""
    import numpy as np

    from ..operators.ivf import build_ivf, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, centroids = build_ivf(emb, nlist=16, seed=42)
    qv = np.array(
        emb.where(F.col("vec_id") == 0).first()["embedding"], dtype=np.float64
    )
    return ivf_topk(
        assigned.where(F.col("vec_id") != 0), centroids, qv, k=10, nprobe=8
    )


@declare("sim_pq_topk", oracle=None)  # rows-only: quantized scores
def sim_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized top-10 neighbors of vec_id 0 (operators/pq.py):
    vectors compressed to 16 byte-codes (m=16, ksub=128 -- 4-dim subspaces
    at full signed-byte resolution), scored via ADC lookup tables -- the
    memory-bound regime where the float corpus can't be resident. pytest
    pins the ADC identity (score == dot with the reconstruction) and
    candidate recall vs the exact query."""
    import numpy as np

    from ..operators.pq import encode_pq, pq_topk, train_pq

    emb = load_table(spark, sf_dir, "embeddings")
    codebooks = train_pq(emb, m=16, ksub=128, seed=42)
    encoded = encode_pq(emb.where(F.col("vec_id") != 0), codebooks)
    qv = np.array(
        emb.where(F.col("vec_id") == 0).first()["embedding"], dtype=np.float64
    )
    return pq_topk(encoded, codebooks, qv, k=10)


@declare("sim_ivfpq_topk", oracle=None)  # rows-only: composed ANN index
def sim_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF+PQ top-10 for vec_id 0: probe cells (IO bound), ADC on
    residual byte codes (memory bound; q.centroid offset added per cell),
    exact re-rank of the candidate short-list. Vectors are multi-assigned
    to their 2 nearest cells (replica dedup by best ADC score), codebooks
    trained on residuals: recall@10 at nprobe=8 is pinned >= 0.9 by
    pytest, monotone in nprobe; full-probe + wide refine == exact."""
    import numpy as np

    from ..operators.pq import build_ivfpq, ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    coded, centroids, codebooks = build_ivfpq(
        emb, nlist=16, m=16, ksub=128, seed=42, assign=2
    )
    qv = np.array(
        emb.where(F.col("vec_id") == 0).first()["embedding"], dtype=np.float64
    )
    return ivfpq_topk(
        spark,
        coded.where(F.col("vec_id") != 0),
        emb.where(F.col("vec_id") != 0),
        centroids,
        codebooks,
        qv,
        k=10,
        nprobe=8,
        refine=20,
    )


@declare(
    "multimodal_blob",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS blob_len,
           md5(text) AS blob_md5,
           lang
    FROM documents
    """,
)
def multimodal_blob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing: text -> BinaryType blob carried through
    the plan with typed metadata (lang), byte length + content hash
    computed on the binary. Image/audio decode stubs: operators/multimodal.py."""
    d = load_table(spark, sf_dir, "documents")
    blob = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.length(blob).cast("long").alias("blob_len"),
        F.md5(blob).alias("blob_md5"),
        "lang",
    )


def _ivf_index_path(sf_dir: str) -> str:
    """Cache location for the persisted IVF index over sf_dir's embeddings,
    keyed on the source parquet's identity (same discipline as
    plans/partitioned.events_by_day_layout)."""
    import hashlib
    import os
    import tempfile

    src = os.path.join(sf_dir, "embeddings.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    return os.path.join(
        tempfile.gettempdir(), "spark_graft_layouts", f"ivf_idx_{digest}"
    )


def ivf_persisted_index(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once) the PERSISTED IVF index: vectors written
    partitioned by cell (`vectors/cell=N/`) + centroids JSON. A probe then
    reads only its nprobe cell directories -- partition pruning IS the
    index lookup (operators/ivf.write_ivf_index)."""
    import os

    from ..operators.ivf import write_ivf_index

    root = _ivf_index_path(sf_dir)
    if not os.path.exists(os.path.join(root, "centroids.json")):
        emb = load_table(spark, sf_dir, "embeddings")
        write_ivf_index(emb, root, nlist=16, seed=42)
    return root


@declare(
    "sim_ivf_persisted_topk",
    oracle="""
    SELECT vec_id,
           ROUND(list_dot_product(
             CAST(embedding AS DOUBLE[]),
             (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 6)
             AS cos
    FROM embeddings
    WHERE vec_id <> 0
    ORDER BY cos DESC, vec_id
    LIMIT 10
    """,
)
def sim_ivf_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 neighbors served from the PERSISTED IVF index (the
    deployment shape: index built once, probed per query; probe IO =
    nprobe/nlist of the corpus via `cell=N/` partition pruning, pinned by
    tests/test_partitioned_scan.py::test_ivf_persisted_probe_prunes_files).
    Declared at FULL probe so the result is exact and shares sim_topk's
    oracle -- agreement proves the persisted layout holds exactly the
    corpus (no rows lost or duplicated across cell directories)."""
    import numpy as np

    from ..operators.ivf import ivf_topk, read_ivf_index

    root = ivf_persisted_index(spark, sf_dir)
    vectors, centroids = read_ivf_index(spark, root)
    qv = np.array(
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") == 0)
        .first()["embedding"],
        dtype=np.float64,
    )
    return ivf_topk(
        vectors.where(F.col("vec_id") != 0), centroids, qv,
        k=10, nprobe=len(centroids),
    )
