"""Behavioral pins for batch 39: CUPED must actually reduce variance;
the drift monitor must be quiet on the fixture and loud on a shift."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_cuped_reduces_variance(spark):
    """OLS theta guarantees var(Y - theta(X - X̄)) = var(Y)(1 - rho²) on
    the POOLED sample it was fit on; per-group reduction with a pooled
    theta is only expected, not guaranteed, on tiny groups — so the pin
    is pooled."""
    from hive_person_service_spark.plans.pipeline39 import events_ab_cuped
    from hive_person_service_spark.sources import load_table

    rows = events_ab_cuped(spark, SF_SMALL).collect()
    assert len(rows) == 2 and all(r.n_users > 0 for r in rows)

    e = load_table(spark, SF_SMALL, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp")
    pu = e.groupBy("user_id").agg(
        F.sum(F.when(F.col("ts") < cutoff, F.col("value")).otherwise(0.0)).alias("x"),
        F.sum(F.when(F.col("ts") >= cutoff, F.col("value")).otherwise(0.0)).alias("y"),
    )
    s = pu.agg(
        (F.covar_samp("x", "y") / F.var_samp("x")).alias("th"),
        F.avg("x").alias("xb"),
    ).first()
    adj = pu.select(
        (F.col("y") - s.th * (F.col("x") - s.xb)).alias("yc"), "y"
    ).agg(F.var_samp("yc").alias("vc"), F.var_samp("y").alias("vr")).first()
    assert adj.vc <= adj.vr + 1e-9


def test_drift_monitor_quiet_then_loud(spark):
    from hive_person_service_spark.plans.pipeline39 import emb_drift_monitor
    from hive_person_service_spark.sources import load_table

    r = emb_drift_monitor(spark, SF_SMALL).first()
    # both halves draw from one distribution: small drifts
    assert r.centroid_shift < 0.5
    assert abs(r.norm_drift) < 0.05
    # injected shift: add 0.5 to dim 0 of half 1 and re-derive the
    # centroid shift — the monitor's statistic must move far above the
    # quiet baseline
    e = load_table(spark, SF_SMALL, "embeddings")
    shifted = e.select(
        (F.col("vec_id") % 2).cast("int").alias("half"),
        F.expr(
            "transform(embedding, (x, i) -> cast(x as double)"
            " + if(i = 0 and vec_id % 2 = 1, 0.5, 0.0))"
        ).alias("v"),
    )
    cent = (
        shifted.select("half", F.posexplode("v").alias("dim", "x"))
        .groupBy("half", "dim")
        .agg(F.avg("x").alias("c"))
    )
    a = cent.where(F.col("half") == 0).select("dim", F.col("c").alias("ca"))
    b = cent.where(F.col("half") == 1).select("dim", F.col("c").alias("cb"))
    shift = (
        a.join(b, "dim")
        .agg(F.sqrt(F.sum((F.col("ca") - F.col("cb")) ** 2)))
        .first()[0]
    )
    assert shift > 0.45  # ~the injected 0.5, dominating the baseline noise
    assert shift > 5 * r.centroid_shift
