"""Vector pipeline batch 2 -- embedding-space curation operators (all
oracle-checked, which is rare for clustering surfaces and possible here
because the centroid seeding is deterministic):

- cluster_kmeans_assign: one Lloyd ASSIGNMENT pass against deterministic
  seed centroids (the K lowest vec_ids -- the k-means|| round-0 analog).
  The iterative refinement lives in operators/ivf.py (numpy Lloyd with a
  recall pytest); this query pins the distributed assignment step -- the
  part that actually touches all N rows at 100 TB -- against the oracle.
- sem_dedup: SemDeDup (Abbas et al. 2023): cluster embeddings, then drop
  any vector that has a lower-id neighbor with cosine >= TAU *within its
  cluster*. Pairwise work is confined to cluster cells, so the quadratic
  term is (N/K)^2 per cell, not N^2 -- the scale story of the paper.
- emb_quantize_int8: symmetric per-vector int8 scalar quantization
  (max-abs scale), with saturation count and reconstruction MAE -- the
  compression step before shipping embeddings to an ANN index; 4x smaller
  vectors means 4x more index in the same executor memory.

Scale notes: centroids (K rows) broadcast; assignment is map-side +
a partial-agg groupBy on vec_id. sem_dedup's self-join shuffles on the
cluster key only; quantization is a pure map pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, to_double_array
from ..sources import load_table
from .registry import declare

K_CLUSTERS = 8
SEM_TAU = 0.4

_CENT_SQL = f"""
      SELECT vec_id AS c_id, CAST(embedding AS DOUBLE[]) AS ce
      FROM embeddings ORDER BY vec_id LIMIT {K_CLUSTERS}"""

_ASSIGN_SQL = f"""
      SELECT vec_id, c_id AS cluster, cos FROM (
        SELECT e.vec_id, c.c_id,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), c.ce) AS cos,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY list_dot_product(
                                    CAST(e.embedding AS DOUBLE[]), c.ce) DESC,
                                  c.c_id) AS rn
        FROM embeddings e CROSS JOIN cent c)
      WHERE rn = 1"""


def _assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic-seed assignment: argmax cosine over the K broadcast
    centroids, computed as a partial-aggregable groupBy max(struct) --
    map-side combine, no per-vector window shuffle."""
    emb = load_table(spark, sf_dir, "embeddings")
    cent = F.broadcast(
        emb.orderBy("vec_id")
        .limit(K_CLUSTERS)
        .select(
            F.col("vec_id").alias("c_id"), to_double_array("embedding").alias("ce")
        )
    )
    scored = emb.select(
        "vec_id", to_double_array("embedding").alias("ev")
    ).crossJoin(cent).select(
        "vec_id", "c_id", cosine_expr(F.col("ev"), F.col("ce")).alias("cos")
    )
    best = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("cos"), (-F.col("c_id")).alias("neg_c"))).alias("b")
    )
    return best.select(
        "vec_id",
        (-F.col("b.neg_c")).cast("long").alias("cluster"),
        F.col("b.cos").alias("cos"),
    )


@declare(
    "cluster_kmeans_assign",
    oracle=f"""
    WITH cent AS ({_CENT_SQL}),
    assign AS ({_ASSIGN_SQL})
    SELECT vec_id, CAST(cluster AS BIGINT) AS cluster, ROUND(cos, 6) AS cos
    FROM assign
    """,
)
def cluster_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means assignment pass with deterministic seed centroids (K lowest
    vec_ids): cross join against the broadcast centroid block, argmax cosine
    with lowest-c_id tie-break via max(struct) partial aggregation."""
    a = _assignment(spark, sf_dir)
    return a.select("vec_id", "cluster", F.round("cos", 6).alias("cos"))


@declare(
    "sem_dedup",
    oracle=f"""
    WITH cent AS ({_CENT_SQL}),
    assign AS ({_ASSIGN_SQL}),
    dropped AS (
      SELECT DISTINCT b.vec_id
      FROM assign a
      JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      JOIN embeddings ea ON ea.vec_id = a.vec_id
      JOIN embeddings eb ON eb.vec_id = b.vec_id
      WHERE list_dot_product(CAST(ea.embedding AS DOUBLE[]),
                             CAST(eb.embedding AS DOUBLE[])) >= {SEM_TAU})
    SELECT s.vec_id, CAST(s.cluster AS BIGINT) AS cluster,
           CAST(d.vec_id IS NULL AS BIGINT) AS keep
    FROM assign s LEFT JOIN dropped d ON s.vec_id = d.vec_id
    """,
)
def sem_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: drop any vector with a lower-id cosine>=TAU neighbor in its
    cluster. The pairwise join shuffles on the cluster key, so candidate
    pairs form only inside cells ((N/K)^2 per cell, never N^2); survivors
    are the lowest-id representative of each semantic near-dup set."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("ev")
    )
    # three consumers (both self-join sides + the final keep join): persist
    # so the K x N centroid scoring pass runs once, not three times
    # (bounded slot, guide §5)
    from ..operators.caching import persist_bounded

    assign = persist_bounded(
        "sem_dedup_assign",
        _assignment(spark, sf_dir).select("vec_id", "cluster"),
    )
    va = assign.join(emb, "vec_id")
    a = va.select(
        F.col("vec_id").alias("a_id"), F.col("cluster").alias("ca"), F.col("ev").alias("eva")
    )
    b = va.select(
        F.col("vec_id").alias("b_id"), F.col("cluster").alias("cb"), F.col("ev").alias("evb")
    )
    dropped = (
        a.join(b, (F.col("ca") == F.col("cb")) & (F.col("a_id") < F.col("b_id")))
        .filter(cosine_expr(F.col("eva"), F.col("evb")) >= SEM_TAU)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    return assign.join(dropped, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.col("is_dropped").isNull().cast("long").alias("keep"),
    )


@declare(
    "emb_quantize_int8",
    oracle="""
    SELECT vec_id, ROUND(scale, 6) AS scale,
           CAST(len(list_filter(ev, x ->
                  abs(FLOOR(x / scale * 127.0 + 0.5)) = 127)) AS BIGINT) AS n_sat,
           FLOOR(list_dot_product(
                   list_transform(ev, x ->
                     abs(x - FLOOR(x / scale * 127.0 + 0.5) * scale / 127.0)),
                   list_transform(ev, x -> 1.0)) / 64.0 * 1e9 + 0.5) / 1e9
             AS mae
    FROM (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev,
             list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                     x -> abs(x))) AS scale
      FROM embeddings)
    """,
)
def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 scalar quantization per vector: max-abs scale,
    FLOOR(x/scale*127 + .5) codes (FLOOR-half-up -- engine-identical,
    unlike ROUND), saturation count, and reconstruction MAE summed with the
    same left-to-right fold as DuckDB's list_dot_product. Pure map pass."""
    emb = load_table(spark, sf_dir, "embeddings")
    ev = to_double_array("embedding")
    scale = F.array_max(F.transform(ev, F.abs))
    codes = F.transform(ev, lambda x: F.floor(x / scale * 127.0 + 0.5))
    abs_err = F.zip_with(
        ev, codes, lambda x, c: F.abs(x - c * scale / 127.0)
    )
    mae_sum = F.aggregate(abs_err, F.lit(0.0), lambda acc, v: acc + v)
    return emb.select(
        "vec_id",
        F.round(scale, 6).alias("scale"),
        F.size(F.filter(codes, lambda c: F.abs(c) == 127)).cast("long").alias("n_sat"),
        (F.floor(mae_sum / 64.0 * 1e9 + 0.5) / 1e9).alias("mae"),
    )


OUTLIER_TOPK = 20


@declare(
    "emb_label_outliers",
    oracle=f"""
    WITH expl AS (
      SELECT vec_id, label, pos, CAST(embedding AS DOUBLE[])[pos] AS v
      FROM embeddings, unnest(generate_series(1, 64)) AS g(pos)),
    cent AS (
      SELECT label, pos, AVG(v) AS c FROM expl GROUP BY label, pos),
    dist AS (
      SELECT e.vec_id, e.label,
             FLOOR(SUM((e.v - c.c) * (e.v - c.c)) * 1e6 + 0.5) / 1e6 AS d2
      FROM expl e JOIN cent c ON e.label = c.label AND e.pos = c.pos
      GROUP BY e.vec_id, e.label)
    SELECT label, vec_id, d2, rk FROM (
      SELECT label, vec_id, d2,
             CAST(row_number() OVER (
               PARTITION BY label ORDER BY d2 DESC, vec_id) AS BIGINT) AS rk
      FROM dist)
    WHERE rk <= {OUTLIER_TOPK}
    """,
)
def emb_label_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label-quality audit: squared L2 distance of each vector to its OWN
    label's centroid, top-20 farthest per label (mislabel candidates --
    the embedding-space label-noise detector). Centroids come from a
    per-(label, dim) grouped average over the posexploded vectors; ranking
    happens on the FLOOR-rounded distance (6dp) with a vec_id tie-break, so
    cross-engine float accumulation differences cannot reorder ranks.
    Per-label windows are bounded; rank<=k pushes down (WindowGroupLimit)."""
    emb = load_table(spark, sf_dir, "embeddings")
    expl = emb.select(
        "vec_id",
        "label",
        F.posexplode(to_double_array("embedding")).alias("pos0", "v"),
    ).select("vec_id", "label", (F.col("pos0") + 1).alias("pos"), "v")
    cent = expl.groupBy("label", "pos").agg(F.avg("v").alias("c"))
    dist = (
        expl.join(F.broadcast(cent), ["label", "pos"])
        .groupBy("vec_id", "label")
        .agg(
            (
                F.floor(F.sum((F.col("v") - F.col("c")) ** 2) * 1e6 + 0.5) / 1e6
            ).alias("d2")
        )
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy("label").orderBy(F.desc("d2"), "vec_id")
    )
    return (
        dist.select("label", "vec_id", "d2", rk.cast("long").alias("rk"))
        .where(F.col("rk") <= OUTLIER_TOPK)
    )
