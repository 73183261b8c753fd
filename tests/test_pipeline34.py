"""Behavioral pins for batch 34: spectral centroid vs direct numpy,
skyline vs brute force, snapshot rollback state, PIT join leakage."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_spectral_matches_numpy_reference(spark):
    from hive_person_service_spark.plans.pipeline34 import (
        SPECTRAL_N_SAMPLES,
        SPECTRAL_WINDOW,
        multimodal_audio_spectral,
    )

    rows = multimodal_audio_spectral(spark, SF_SMALL).collect()
    assert rows
    got = {(r.asset_id, r.win_id): (r.centroid, r.high_ratio) for r in rows}
    # Independent reference for a handful of assets.
    for aid in (0, 7, 42):
        n = np.arange(SPECTRAL_N_SAMPLES, dtype=np.int64)
        pcm = ((n * 31 + aid * 7) % 65536 - 32768).astype(np.float64)
        for w_id in range(SPECTRAL_N_SAMPLES // SPECTRAL_WINDOW):
            seg = pcm[w_id * SPECTRAL_WINDOW : (w_id + 1) * SPECTRAL_WINDOW]
            mag = np.abs(np.fft.rfft(seg))
            centroid = round(float((np.arange(len(mag)) * mag).sum() / mag.sum()), 6)
            high = round(float(mag[len(mag) // 2 :].sum() / mag.sum()), 6)
            assert got[(aid, w_id)] == (centroid, high)


def test_skyline_equals_bruteforce(spark):
    """The O(n log n) window formulation must equal the quadratic
    dominance definition on the full sf0.001 part table."""
    from hive_person_service_spark.plans.pipeline34 import parts_skyline
    from hive_person_service_spark.sources import load_table

    fast = {
        r.p_partkey for r in parts_skyline(spark, SF_SMALL).collect()
    }
    parts = [
        (r.p_partkey, r.p_brand, r.p_retailprice, r.p_size)
        for r in load_table(spark, SF_SMALL, "part").collect()
    ]
    brute = set()
    for pk, b, pr, sz in parts:
        dominated = any(
            qb == b
            and qpr <= pr
            and qsz >= sz
            and (qpr < pr or qsz > sz)
            for _, qb, qpr, qsz in parts
        )
        if not dominated:
            brute.add(pk)
    assert fast == brute


def test_snapshot_rollback_state(spark):
    from hive_person_service_spark.plans.pipeline34 import (
        table_snapshot_rollback,
    )
    from hive_person_service_spark.sources import load_table

    table_snapshot_rollback(spark, SF_SMALL).collect()  # builds + rolls back
    import hashlib
    import os

    from hive_person_service_spark.operators.snapshots import SnapshotTable
    from hive_person_service_spark.plans.pipeline34 import _LAYOUT_ROOT

    src = os.path.join(SF_SMALL, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:rb".encode()
    ).hexdigest()[:12]
    snap = SnapshotTable(spark, os.path.join(_LAYOUT_ROOT, f"orders_rollback_{digest}"))
    hist = snap.history()
    assert [e["version"] for e in hist] == [1, 2]  # both snapshots retained
    # Current points at v1 (full) even though v2 (deleted) is newer.
    n_full = load_table(spark, SF_SMALL, "orders").count()
    assert snap.read().count() == n_full
    assert snap.read(2).count() < n_full  # the bad delete is still auditable


def test_pit_join_never_leaks_future_versions(spark):
    """Every joined balance must come from a version whose validity
    interval contains the purchase timestamp."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.operators.scd import scd2_merge
    from hive_person_service_spark.sources import load_table

    ev = load_table(spark, SF_SMALL, "events")
    upd = ev.where(F.col("event_type") == "signup").select(
        "user_id", F.col("value").alias("balance"), "ts"
    )
    empty = upd.limit(0).select(
        "user_id",
        "balance",
        F.col("ts").alias("effective_from"),
        F.col("ts").alias("effective_to"),
        F.lit(True).alias("is_current"),
    )
    hist = scd2_merge(empty, upd, ["user_id"], ["balance"], "ts")
    facts = load_table(spark, SF_SMALL, "events").where(
        F.col("event_type") == "purchase"
    )
    joined = facts.join(
        hist.select(
            F.col("user_id").alias("h_user"), "effective_from", "effective_to"
        ),
        (facts.user_id == F.col("h_user"))
        & (facts.ts >= F.col("effective_from"))
        & (F.col("effective_to").isNull() | (facts.ts < F.col("effective_to"))),
    )
    bad = joined.where(
        (F.col("ts") < F.col("effective_from"))
        | (
            F.col("effective_to").isNotNull()
            & (F.col("ts") >= F.col("effective_to"))
        )
    ).count()
    assert bad == 0
    # And at most one version matches per fact (intervals are disjoint).
    per_fact = joined.groupBy("event_id").count().agg(F.max("count")).first()[0]
    assert per_fact == 1
