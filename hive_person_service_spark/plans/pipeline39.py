"""Round-4 continuation batch 39: variance-reduced experiment analysis
and embedding-distribution monitoring.

- events_ab_cuped: CUPED (Controlled-experiment Using Pre-Experiment
  Data) — the industry-standard variance-reduction for A/B tests: the
  post-period metric is adjusted by its pre-period covariate
  (Y' = Y - theta (X - E[X])), shrinking variance by the squared
  correlation and making small effects detectable sooner. Completes the
  experimentation pair with events_ab_ztest.
- emb_drift_monitor: the embedding-pipeline health check — centroid
  shift, mean-norm drift, and dimension-wise max drift between two
  deterministic halves of the corpus; the alarm that catches a silent
  encoder/version change before it poisons retrieval.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "events_ab_cuped",
    oracle="""
    WITH per_user AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS grp,
             SUM(CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-15'
                 THEN value ELSE 0 END) AS x_pre,
             SUM(CASE WHEN CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-15'
                 THEN value ELSE 0 END) AS y_post
      FROM events GROUP BY user_id),
    theta AS (
      SELECT covar_samp(x_pre, y_post) / var_samp(x_pre) AS th,
             AVG(x_pre) AS x_bar
      FROM per_user),
    adjusted AS (
      SELECT grp,
             y_post,
             y_post - (SELECT th FROM theta)
                      * (x_pre - (SELECT x_bar FROM theta)) AS y_cuped
      FROM per_user)
    SELECT grp,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           ROUND(AVG(y_post), 4) AS mean_raw,
           ROUND(AVG(y_cuped), 4) AS mean_cuped,
           ROUND(var_samp(y_post), 2) AS var_raw,
           ROUND(var_samp(y_cuped), 2) AS var_cuped
    FROM adjusted GROUP BY grp
    """,
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: per user, the post-period value sum is
    adjusted by the pre-period covariate (theta = cov/var over the user
    relation, the OLS slope), and the per-group variance of the adjusted
    metric shrinks by rho^2 — the standard trick that lets an experiment
    platform call small effects days earlier. Deterministic hash split,
    one user-grain aggregate, one 1-row stats broadcast, exact
    arithmetic; the variance columns make the adjustment VISIBLE per
    group (the guaranteed pooled-sample reduction — var(Y_cuped) =
    var(Y)(1 - rho²) for the OLS theta — is pinned in pytest; per-group
    reduction with a pooled theta is expected, not guaranteed, on tiny
    groups). At 100 TB the
    user-grain pass is the only corpus shuffle — identical shape to
    events_ab_ztest, they share it in a real platform."""
    e = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    per_user = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, F.col("value")).otherwise(0.0)).alias(
            "x_pre"
        ),
        F.sum(F.when(F.col("ts") >= cutoff, F.col("value")).otherwise(0.0)).alias(
            "y_post"
        ),
    ).select((F.col("user_id") % 2).cast("int").alias("grp"), "x_pre", "y_post")
    theta = per_user.agg(
        (F.covar_samp("x_pre", "y_post") / F.var_samp("x_pre")).alias("th"),
        F.avg("x_pre").alias("x_bar"),
    )
    adjusted = per_user.crossJoin(F.broadcast(theta)).select(
        "grp",
        "y_post",
        (
            F.col("y_post")
            - F.col("th") * (F.col("x_pre") - F.col("x_bar"))
        ).alias("y_cuped"),
    )
    return adjusted.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_users"),
        F.round(F.avg("y_post"), 4).alias("mean_raw"),
        F.round(F.avg("y_cuped"), 4).alias("mean_cuped"),
        F.round(F.var_samp("y_post"), 2).alias("var_raw"),
        F.round(F.var_samp("y_cuped"), 2).alias("var_cuped"),
    )


@declare(
    "emb_drift_monitor",
    oracle="""
    WITH halves AS (
      SELECT CAST(vec_id % 2 AS INT) AS half,
             CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings),
    norms AS (
      SELECT half, CAST(COUNT(*) AS BIGINT) AS n,
             AVG(sqrt(list_dot_product(v, v))) AS mean_norm
      FROM halves GROUP BY half),
    exploded AS (
      SELECT half, g.i AS dim, v[CAST(g.i AS INTEGER)] AS x
      FROM halves CROSS JOIN generate_series(1, 64) g(i)),
    cent AS (
      SELECT half, dim, SUM(x) / COUNT(*) AS c
      FROM exploded GROUP BY half, dim),
    diffs AS (
      SELECT a.c - b.c AS d
      FROM cent a JOIN cent b ON a.dim = b.dim
      WHERE a.half = 0 AND b.half = 1),
    agg AS (
      SELECT ROUND(sqrt(SUM(d * d)), 6) AS centroid_shift,
             ROUND(MAX(abs(d)), 6) AS max_dim_drift
      FROM diffs)
    SELECT na.n AS n_a, nb.n AS n_b,
           agg.centroid_shift,
           ROUND(na.mean_norm - nb.mean_norm, 6) AS norm_drift,
           agg.max_dim_drift
    FROM agg,
         (SELECT n, mean_norm FROM norms WHERE half = 0) na,
         (SELECT n, mean_norm FROM norms WHERE half = 1) nb
    """,
)
def emb_drift_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: split the corpus into two
    deterministic halves (in production: yesterday's batch vs today's),
    compare per-dimension centroids, mean L2 norm, and the worst single
    dimension — the cheap alarm that catches a silently swapped encoder
    checkpoint, a normalization regression, or a truncated write before
    bad vectors poison retrieval. One aggregation computes a 64-double
    centroid per half (posexplode -> (half, dim) partial aggregation —
    mergeable, no vector ever leaves its executor); the comparison is a
    2-row join. On the fixture both halves draw from one distribution,
    so the drifts are near zero — the pytest pins the green baseline
    AND that an injected shift fires the monitor."""
    e = load_table(spark, sf_dir, "embeddings")
    halves = e.select(
        (F.col("vec_id") % 2).cast("int").alias("half"),
        F.expr("transform(embedding, x -> cast(x as double))").alias("v"),
    )
    by_dim = (
        halves.select("half", F.posexplode("v").alias("dim", "x"))
        .groupBy("half", "dim")
        .agg(F.sum("x").alias("sx"))
    )
    norms = halves.groupBy("half").agg(
        F.count("*").cast("long").alias("n"),
        F.avg(
            F.sqrt(
                F.expr(
                    "aggregate(zip_with(v, v, (a, b) -> a * b),"
                    " cast(0.0 as double), (acc, x) -> acc + x)"
                )
            )
        ).alias("mean_norm"),
    )
    cent = by_dim.join(norms.select("half", "n"), "half").select(
        "half", "dim", (F.col("sx") / F.col("n")).alias("c")
    )
    a = cent.where(F.col("half") == 0).select("dim", F.col("c").alias("ca"))
    b = cent.where(F.col("half") == 1).select("dim", F.col("c").alias("cb"))
    diffs = a.join(b, "dim").select((F.col("ca") - F.col("cb")).alias("d"))
    agg = diffs.agg(
        F.round(F.sqrt(F.sum(F.col("d") * F.col("d"))), 6).alias("centroid_shift"),
        F.round(F.max(F.abs("d")), 6).alias("max_dim_drift"),
    )
    na = norms.where(F.col("half") == 0).select(
        F.col("n").alias("n_a"), F.col("mean_norm").alias("norm_a")
    )
    nb = norms.where(F.col("half") == 1).select(
        F.col("n").alias("n_b"), F.col("mean_norm").alias("norm_b")
    )
    return (
        na.crossJoin(nb)
        .crossJoin(F.broadcast(agg))
        .select(
            "n_a",
            "n_b",
            "centroid_shift",
            F.round(F.col("norm_a") - F.col("norm_b"), 6).alias("norm_drift"),
            "max_dim_drift",
        )
    )
