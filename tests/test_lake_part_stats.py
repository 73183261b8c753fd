"""Behavioral pins for the round-6 lake-planning surface: Iceberg
partition transforms (spec Murmur3 bucket test vectors), manifest-level
partition + bounds file pruning, schema evolution by parquet field id,
timestamp time travel, and the Delta side: per-file add-action ``stats``,
data skipping, MERGE INTO via deletion vectors, TIMESTAMP AS OF.

The pruning pins all follow one rule: the pruned scan must read strictly
fewer files AND produce exactly the rows the unpruned scan + predicate
produces -- pruning is a metadata optimization, never a semantics
change."""

from __future__ import annotations

import json
import struct
from pathlib import Path

import numpy as np
import pytest


# ---------------------------------------------------------------------------
# transforms / hashing (pure, no Spark)
# ---------------------------------------------------------------------------


def test_murmur3_spec_vectors():
    """The Iceberg spec appendix's published bucket-hash test vectors."""
    from hive_person_service_spark.sources.iceberg_transforms import murmur3_32

    assert murmur3_32(struct.pack("<q", 34)) == 2017239379  # int AND long 34
    assert murmur3_32(b"iceberg") == 1210000089
    assert murmur3_32(struct.pack("<q", 17486)) == -653330422  # date 2017-11-16


def test_murmur3_vectorized_matches_scalar():
    from hive_person_service_spark.sources.iceberg_transforms import (
        murmur3_32,
        murmur3_32_longs,
    )

    rng = np.random.default_rng(7)
    v = rng.integers(-(2**62), 2**62, size=500, dtype=np.int64)
    vec = murmur3_32_longs(v)
    ref = [murmur3_32(struct.pack("<q", int(x))) & 0xFFFFFFFF for x in v]
    assert [int(x) for x in vec] == ref


def test_transforms_day_month_year_truncate():
    from hive_person_service_spark.sources.iceberg_transforms import (
        apply_transform,
        canonical,
    )
    from datetime import datetime

    micros = canonical(datetime(2024, 3, 1, 12, 0, 0), "timestamp")
    assert apply_transform(micros, "day", "timestamp") == 19783
    assert apply_transform(micros, "month", "timestamp") == (2024 - 1970) * 12 + 2
    assert apply_transform(micros, "year", "timestamp") == 54
    assert apply_transform(-7, "truncate[10]", "long") == -10  # floors, not trunc
    assert apply_transform(17, "truncate[10]", "long") == 10
    assert apply_transform("abcdef", "truncate[3]", "string") == "abc"


def test_single_value_serialization_roundtrip():
    from hive_person_service_spark.sources.iceberg_transforms import (
        sv_decode,
        sv_encode,
    )

    for v, t in [
        (42, "int"), (-(2**40), "long"), (3.5, "double"), ("héllo", "string"),
        (True, "boolean"), (19783, "date"), (1709294400000000, "timestamp"),
    ]:
        assert sv_decode(sv_encode(v, t), t) == v


# ---------------------------------------------------------------------------
# Iceberg: partitioned writes + manifest pruning
# ---------------------------------------------------------------------------


def _events(spark, n=400):
    from pyspark.sql import functions as F

    return (
        spark.range(n)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_micros(
                (F.lit(1_700_000_000_000_000) + F.col("id") * 7_200_000_000)
            ).alias("ts"),
            (F.col("id") % 37).alias("user_id"),
            (F.col("id") * 10).cast("double").alias("value"),
        )
    )


def test_iceberg_partitioned_scan_prunes_and_matches(spark, tmp_path):
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.iceberg import (
        _load_metadata,
        _plan_snapshot,
        _prune_plan,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "part")
    spec = [
        {"name": "ts_day", "transform": "day", "source": "ts"},
        {"name": "uid_bucket", "transform": "bucket[4]", "source": "user_id"},
    ]
    iceberg_write(_events(spark), t, partition_spec=spec)
    meta = _load_metadata(t)
    plan = _plan_snapshot(t, meta, None)
    n_all = len(plan["data"])
    assert n_all > 4
    # every entry carries partition values and bounds
    p0 = plan["data"][0][2]
    assert set(p0["partition"]) == {"ts_day", "uid_bucket"}
    assert p0["lower"] and p0["upper"]

    days = sorted({int(x[2]["partition"]["ts_day"]) for x in plan["data"]})
    cut = days[len(days) // 2]
    cut_us = cut * 86_400_000_000

    # direct partition-name filter prunes
    n_day = len(_prune_plan(plan, meta, [("ts_day", ">=", cut)])["data"])
    assert 0 < n_day < n_all
    # source-column filter projects THROUGH the day transform identically
    assert (
        len(_prune_plan(plan, meta, [("ts", ">=", cut_us)])["data"]) == n_day
    )
    # bucket projection: equality on the source prunes to ~1/4 of files
    n_bkt = len(_prune_plan(plan, meta, [("user_id", "=", 5)])["data"])
    assert 0 < n_bkt < n_all
    # bucket never projects RANGE ops (that projection would be wrong):
    # a range filter may still prune via column BOUNDS, but every bucket
    # value must stay represented -- pruning whole buckets on a range
    # would be the bug this pins against
    rng = _prune_plan(plan, meta, [("user_id", ">", 0)])["data"]
    all_buckets = {x[2]["partition"]["uid_bucket"] for x in plan["data"]}
    assert {x[2]["partition"]["uid_bucket"] for x in rng} == all_buckets

    # pruned scan + residual predicate == full scan + predicate, exactly
    pred = F.unix_micros(F.col("ts").cast("timestamp")) >= cut_us
    full = {r.event_id for r in iceberg_scan(spark, t).where(pred).collect()}
    fast_df = iceberg_scan(spark, t, skip_filters=[("ts", ">=", cut_us)])
    fast = {r.event_id for r in fast_df.where(pred).collect()}
    assert fast == full
    # and it physically reads fewer files
    assert len(fast_df.inputFiles()) == n_day < n_all

    u5 = iceberg_scan(spark, t, skip_filters=[("user_id", "=", 5)])
    assert {r.event_id for r in u5.where("user_id = 5").collect()} == {
        r.event_id
        for r in iceberg_scan(spark, t).where("user_id = 5").collect()
    }


def test_iceberg_bucket_partition_matches_spec_hash(spark, tmp_path):
    """The partition value written for bucket[N] must equal the spec's
    murmur3-based bucket of the source value -- checked value-by-value."""
    from hive_person_service_spark.sources.iceberg import (
        _load_metadata,
        _plan_snapshot,
        iceberg_scan,
        iceberg_write,
    )
    from hive_person_service_spark.sources.iceberg_transforms import bucket_value

    t = str(tmp_path / "bkt")
    spec = [{"name": "b", "transform": "bucket[8]", "source": "user_id"}]
    iceberg_write(_events(spark, 64), t, partition_spec=spec)
    meta = _load_metadata(t)
    for path, _seq, info in _plan_snapshot(t, meta, None)["data"]:
        b = int(info["partition"]["b"])
        import pyarrow.parquet as papq

        uids = papq.read_table(path, columns=["user_id"])["user_id"].to_pylist()
        assert all(bucket_value(u, "long", 8) == b for u in uids)


def test_iceberg_stats_bounds_prune_unpartitioned(spark, tmp_path):
    """Pure bounds-based skipping (no partition spec): range-layout files
    prune on a value filter; results identical to the full scan."""
    from hive_person_service_spark.sources.iceberg import iceberg_scan, iceberg_write

    t = str(tmp_path / "bounds")
    df = _events(spark, 400).repartitionByRange(8, "value")
    iceberg_write(df, t)
    full_df = iceberg_scan(spark, t)
    fast_df = iceberg_scan(spark, t, skip_filters=[("value", ">=", 3500.0)])
    assert len(fast_df.inputFiles()) < len(full_df.inputFiles())
    assert {r.event_id for r in fast_df.where("value >= 3500").collect()} == {
        r.event_id for r in full_df.where("value >= 3500").collect()
    }


def test_iceberg_pruning_composes_with_deletes(spark, tmp_path):
    """skip_filters + v2 position deletes in one read: pruning must not
    resurrect deleted rows or lose live ones."""
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "prunedel")
    iceberg_write(_events(spark, 200).repartitionByRange(4, "value"), t)
    iceberg_delete(spark, t, "event_id % 3 = 0")
    full = {
        r.event_id
        for r in iceberg_scan(spark, t).where("value >= 600").collect()
    }
    fast = {
        r.event_id
        for r in iceberg_scan(spark, t, skip_filters=[("value", ">=", 600.0)])
        .where("value >= 600")
        .collect()
    }
    assert fast == full
    assert all(e % 3 != 0 for e in full)


def test_iceberg_manifest_list_pruning(spark, tmp_path):
    """The second pruning tier: with one manifest per append (disjoint
    day ranges), a day filter must skip READING the non-matching
    manifests entirely -- observed by deleting their Avro files from
    disk: planning with the filter still works; without it, it can't."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.iceberg import (
        _load_metadata,
        _plan_snapshot,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "mlist")
    spec = [{"name": "ts_day", "transform": "day", "source": "ts"}]
    ev = _events(spark, 240)
    days = ev.select(
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        .cast("int")
        .alias("d")
    )
    lo, hi = days.agg(F.min("d"), F.max("d")).first()
    mid = (lo + hi) // 2
    early = ev.where(
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        <= mid
    )
    late = ev.where(
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
        > mid
    )
    iceberg_write(early, t, partition_spec=spec)
    iceberg_write(late, t)  # second manifest, disjoint day range
    meta = _load_metadata(t)
    full = _plan_snapshot(t, meta, None)
    pruned = _plan_snapshot(t, meta, None, skip_filters=[("ts_day", ">", mid)])
    assert 0 < len(pruned["data"]) < len(full["data"])
    # results with filter+residual == unfiltered scan + predicate
    want = {
        r.event_id
        for r in iceberg_scan(spark, t)
        .where(
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
            > mid
        )
        .collect()
    }
    got = {
        r.event_id
        for r in iceberg_scan(spark, t, skip_filters=[("ts_day", ">", mid)])
        .where(
            F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 86_400_000_000)
            > mid
        )
        .collect()
    }
    assert got == want
    # the early manifest is never READ under the filter: corrupt it and
    # the filtered plan still succeeds while the full plan fails
    import glob
    import os

    early_paths = {p for p, _s, _i in full["data"]} - {
        p for p, _s, _i in pruned["data"]
    }
    for man in glob.glob(os.path.join(t, "metadata", "manifest-*.avro")):
        from hive_person_service_spark.sources.avro_ocf import read_ocf
        from pathlib import Path as _P

        _, entries = read_ocf(_P(man).read_bytes())
        paths = {
            e["data_file"]["file_path"]
            for e in entries
            if e.get("data_file")
        }
        if paths and paths <= early_paths:
            _P(man).write_bytes(b"corrupted")
    again = _plan_snapshot(t, meta, None, skip_filters=[("ts_day", ">", mid)])
    assert {p for p, _s, _i in again["data"]} == {
        p for p, _s, _i in pruned["data"]
    }
    with pytest.raises(Exception):
        _plan_snapshot(t, meta, None)


def test_iceberg_streaming_ingest_exactly_once(spark, tmp_path):
    """stream_into_iceberg: availableNow drain commits each micro-batch
    with txn idempotence; a crash after commit + restart, AND a fully
    rebuilt checkpoint, both end with the source ingested exactly once."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.iceberg import (
        iceberg_scan,
        iceberg_snapshots,
        iceberg_txn_version,
    )
    from hive_person_service_spark.streaming.jobs import stream_into_iceberg

    landing = str(tmp_path / "landing")
    src = _events(spark, 90)
    for i in range(3):
        src.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{landing}/part{i}.parquet")

    def stream():
        return (
            spark.readStream.schema(
                "event_id long, ts timestamp_ntz, user_id long, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{landing}/part*.parquet")
        )

    t = str(tmp_path / "icestream")
    # crash after batch 1's commit, restart from the SAME checkpoint
    ck = str(tmp_path / "ck")
    stream_into_iceberg(stream(), t, ck, app_id="ev", crash_after_batch=1)
    stream_into_iceberg(stream(), t, ck, app_id="ev")
    assert iceberg_scan(spark, t).count() == 90
    assert iceberg_txn_version(t, "ev") == 2
    n_snaps = len(iceberg_snapshots(t))
    # rebuilt checkpoint: every batch replays; txn versions no-op them all
    stream_into_iceberg(stream(), t, str(tmp_path / "ck2"), app_id="ev")
    assert iceberg_scan(spark, t).count() == 90
    assert len(iceberg_snapshots(t)) == n_snaps


# ---------------------------------------------------------------------------
# Iceberg: schema evolution + timestamp travel
# ---------------------------------------------------------------------------


def test_iceberg_schema_evolution_rename_add_drop(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        iceberg_alter,
        iceberg_scan,
        iceberg_write,
    )
    from pyspark.sql import functions as F

    t = str(tmp_path / "evo")
    base = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, grp string, v double"
    )
    iceberg_write(base, t)
    iceberg_alter(t, rename_columns={"v": "score"}, add_columns=[("tag", "string")])
    iceberg_write(
        spark.createDataFrame(
            [(3, "c", 3.5, "new")], "id long, grp string, score double, tag string"
        ),
        t,
    )
    df = iceberg_scan(spark, t)
    assert df.columns == ["id", "grp", "score", "tag"]
    rows = {r.id: (r.score, r.tag) for r in df.collect()}
    # old files re-resolve the renamed column BY FIELD ID, new column nulls
    assert rows[1] == (1.5, None) and rows[2] == (2.5, None)
    assert rows[3] == (3.5, "new")
    # drop projects the column away without touching data
    iceberg_alter(t, drop_columns=["grp"])
    df2 = iceberg_scan(spark, t)
    assert df2.columns == ["id", "score", "tag"]
    assert df2.count() == 3
    # precise errors
    with pytest.raises(ValueError, match="no column"):
        iceberg_alter(t, rename_columns={"nope": "x"})
    with pytest.raises(ValueError, match="already exists"):
        iceberg_alter(t, add_columns=[("score", "double")])


def test_iceberg_changelog_reconstruction(spark, tmp_path):
    """iceberg_changes: appends -> inserts, position deletes -> deletes
    of the referenced rows, equality deletes -> deletes of the matching
    rows live at the prior snapshot, snapshot windows select sub-ranges,
    and replay (latest change per row wins) reproduces HEAD."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.iceberg import (
        iceberg_changes,
        iceberg_delete,
        iceberg_merge,
        iceberg_scan,
        iceberg_snapshots,
        iceberg_write,
    )

    t = str(tmp_path / "icecdc")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id long, v double"
    )
    iceberg_write(base.repartition(2), t)
    iceberg_delete(spark, t, "id IN (2, 4)")
    src = spark.createDataFrame([(3, 300.0), (100, 1.0)], "id long, v double")
    iceberg_merge(spark, t, src, keys=["id"])
    ch = iceberg_changes(spark, t)
    rows = sorted((r.id, r.v, r._change_type) for r in ch.collect())
    assert (2, 2.0, "delete") in rows and (4, 4.0, "delete") in rows
    assert (3, 3.0, "delete") in rows  # equality-delete pre-image
    assert (3, 300.0, "insert") in rows and (100, 1.0, "insert") in rows
    assert sum(1 for _i, _v, c in rows if c == "insert" and _v == float(_i)) == 10
    # window: from the first snapshot excludes the initial inserts
    snaps = [s["snapshot_id"] for s in iceberg_snapshots(t)]
    w = sorted(
        (r.id, r._change_type)
        for r in iceberg_changes(spark, t, from_snapshot_id=snaps[0]).collect()
    )
    assert w == [
        (2, "delete"), (3, "delete"), (3, "insert"),
        (4, "delete"), (100, "insert"),
    ]
    head = {(r.id, r.v) for r in iceberg_scan(spark, t).collect()}
    applied = {
        (r.id, r.v)
        for r in ch.groupBy("id", "v")
        .agg(F.max_by("_change_type", "_snapshot_id").alias("ct"))
        .where("ct = 'insert'")
        .collect()
    }
    assert applied == head
    with pytest.raises(ValueError, match="empty snapshot range"):
        iceberg_changes(spark, t, from_snapshot_id=snaps[-1],
                        to_snapshot_id=snaps[0])


def test_iceberg_timestamp_time_travel(spark, tmp_path):
    import time as _time

    from hive_person_service_spark.sources.iceberg import (
        iceberg_scan,
        iceberg_snapshots,
        iceberg_write,
    )

    t = str(tmp_path / "ts")
    base = spark.createDataFrame([(1,)], "id long")
    iceberg_write(base, t)
    _time.sleep(0.02)
    iceberg_write(spark.createDataFrame([(2,)], "id long"), t)
    snaps = iceberg_snapshots(t)
    t0, t1 = snaps[0]["timestamp_ms"], snaps[1]["timestamp_ms"]
    assert iceberg_scan(spark, t, as_of_timestamp_ms=t0).count() == 1
    assert iceberg_scan(spark, t, as_of_timestamp_ms=t1 + 1).count() == 2
    with pytest.raises(ValueError, match="no snapshot at or before"):
        iceberg_scan(spark, t, as_of_timestamp_ms=t0 - 10_000)
    with pytest.raises(ValueError, match="not both"):
        iceberg_scan(spark, t, snapshot_id=1, as_of_timestamp_ms=t1)


def test_iceberg_partition_spec_is_creation_only(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import iceberg_write

    t = str(tmp_path / "speclock")
    spec = [{"name": "b", "transform": "bucket[4]", "source": "event_id"}]
    iceberg_write(_events(spark, 20), t, partition_spec=spec)
    # same spec on append is fine; a DIFFERENT spec gates precisely
    iceberg_write(_events(spark, 20), t, partition_spec=spec)
    with pytest.raises(ValueError, match="partition_spec"):
        iceberg_write(_events(spark, 20), t, partition_spec=[])


# ---------------------------------------------------------------------------
# Delta: stats, skipping, merge, timestamp travel
# ---------------------------------------------------------------------------


def test_delta_add_actions_carry_stats(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import _snapshot, delta_write

    t = str(tmp_path / "stats")
    delta_write(_events(spark, 100).repartitionByRange(4, "value"), t)
    files, _meta, _p, _v = _snapshot(t)
    for add in files.values():
        st = json.loads(add["stats"])
        assert st["numRecords"] > 0
        assert "value" in st["minValues"] and "value" in st["maxValues"]
        assert st["minValues"]["value"] <= st["maxValues"]["value"]
    # totals reconcile with the table
    assert sum(json.loads(a["stats"])["numRecords"] for a in files.values()) == 100


def test_delta_stats_skipping_prunes_and_matches(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import delta_scan, delta_write

    t = str(tmp_path / "skip")
    delta_write(_events(spark, 400).repartitionByRange(8, "value"), t)
    full_df = delta_scan(spark, t)
    fast_df = delta_scan(spark, t, skip_filters=[("value", ">=", 3500.0)])
    assert len(fast_df.inputFiles()) < len(full_df.inputFiles())
    assert {r.event_id for r in fast_df.where("value >= 3500").collect()} == {
        r.event_id for r in full_df.where("value >= 3500").collect()
    }


def test_delta_partition_value_skipping(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import delta_scan, delta_write

    from pyspark.sql import functions as F

    t = str(tmp_path / "pskip")
    df = _events(spark, 100).withColumn("band", (F.col("event_id") % 5).cast("string"))
    delta_write(df, t, partition_by=["band"])
    fast = delta_scan(spark, t, skip_filters=[("band", "=", "3")])
    full = delta_scan(spark, t)
    assert len(fast.inputFiles()) < len(full.inputFiles())
    assert fast.where("band = '3'").count() == full.where("band = '3'").count() == 20


def test_delta_generated_partition_projection(spark, tmp_path):
    """Generated columns (delta.generationExpression): the writer
    computes p_date = CAST(ts AS DATE) and records the expression;
    appends recompute it automatically; skip_filters on the SOURCE ts
    column prune partitions THROUGH the date truncation. Pruning reads
    strictly fewer files and yields exactly the full scan's rows."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.delta_log import (
        _generated_sources,
        _snapshot,
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "gen")
    ev = _events(spark, 300)
    delta_write(
        ev.where("event_id % 2 = 0"), t,
        partition_by=["p_date"], generated={"p_date": "CAST(ts AS DATE)"},
    )
    delta_write(ev.where("event_id % 2 = 1"), t)  # recomputed on append
    _f, meta, _p, _v = _snapshot(t)
    assert _generated_sources(meta) == {"p_date": ("ts", "date")}
    full = delta_scan(spark, t)
    assert set(full.columns) == {"event_id", "ts", "user_id", "value", "p_date"}
    assert full.count() == 300
    # partition column re-attached correctly across BOTH commit roots
    assert full.where("p_date <> CAST(ts AS DATE)").count() == 0
    cutoff = ev.agg(F.date_add(F.to_date(F.min("ts")), 3).alias("d")).first()["d"]
    fast = delta_scan(
        spark, t,
        skip_filters=[("ts", "<=", f"{cutoff} 23:59:59.999999")],
    )
    assert len(fast.inputFiles()) < len(full.inputFiles())
    pred = F.to_date("ts") <= F.lit(cutoff)
    assert {r.event_id for r in fast.where(pred).collect()} == {
        r.event_id for r in full.where(pred).collect()
    }
    # DV delete + merge work on the multi-root partitioned layout
    from hive_person_service_spark.sources.delta_log import (
        delta_delete,
        delta_merge,
    )

    assert delta_delete(spark, t, "event_id % 5 = 0") == 60
    assert delta_scan(spark, t).count() == 240
    src = ev.where("event_id IN (1, 3)").withColumn("value", F.lit(-1.0))
    assert delta_merge(spark, t, src, keys=["event_id"]) == {
        "updated": 2, "inserted": 0,
    }
    got = delta_scan(spark, t)
    assert got.count() == 240
    assert got.where("event_id IN (1,3) AND value = -1.0").count() == 2
    # generated gate: creation-only
    with pytest.raises(ValueError, match="creation"):
        delta_write(ev.limit(1), t, generated={"x": "event_id + 1"})


def test_delta_timestamp_stats_separator_forms(spark, tmp_path):
    """Timestamp stats serialize ISO-8601 with 'T'; literals in either
    the 'T' or space form must prune identically (the space form
    silently over-pruned before the normalization fix)."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "tsf")
    delta_write(_events(spark, 200).repartitionByRange(8, "ts"), t)
    full = delta_scan(spark, t)
    cutoff = full.agg(F.date_add(F.to_date(F.min("ts")), 3).alias("d")).first()["d"]
    pred = F.to_date("ts") <= F.lit(cutoff)
    want = {r.event_id for r in full.where(pred).collect()}
    for lit in (f"{cutoff} 23:59:59.999999", f"{cutoff}T23:59:59.999999"):
        fast = delta_scan(spark, t, skip_filters=[("ts", "<=", lit)])
        assert len(fast.inputFiles()) < len(full.inputFiles())
        assert {r.event_id for r in fast.where(pred).collect()} == want


def test_delta_merge_upsert(spark, tmp_path):
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.delta_log import (
        delta_merge,
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "merge")
    base = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(20)],
        "id long, grp string, v double",
    )
    delta_write(base.repartition(3), t)
    src = spark.createDataFrame(
        [(5, "gX", 500.0), (7, "gY", 700.0), (100, "gZ", 1.0)],
        "id long, grp string, v double",
    )
    res = delta_merge(spark, t, src, keys=["id"])
    assert res == {"updated": 2, "inserted": 1}
    after = delta_scan(spark, t)
    assert after.count() == 21
    got = {r.id: (r.grp, r.v) for r in after.where("id IN (5,7,100)").collect()}
    assert got == {5: ("gX", 500.0), 7: ("gY", 700.0), 100: ("gZ", 1.0)}
    # untouched rows intact; no duplicate keys
    assert after.where("id = 6 AND v = 6.0").count() == 1
    assert after.groupBy("id").count().where("count > 1").count() == 0
    # merge is DV-based: the delete commit + append commit, no rewrite of
    # untouched files -- idempotent re-merge updates the same rows again
    res2 = delta_merge(spark, t, src, keys=["id"])
    assert res2 == {"updated": 3, "inserted": 0}
    assert delta_scan(spark, t).count() == 21
    # non-unique source gates precisely
    with pytest.raises(ValueError, match="not unique"):
        delta_merge(spark, t, src.union(src), keys=["id"])


def test_delta_merge_stats_survive_checkpoint(spark, tmp_path):
    """stats must flow through the parquet checkpoint, or skipping
    silently dies for checkpointed files."""
    from hive_person_service_spark.sources.delta_log import (
        _read_checkpoint,
        _snapshot,
        delta_write,
    )

    from pyspark.sql import functions as F

    t = str(tmp_path / "ckpt")
    for k in range(4):
        delta_write(
            _events(spark, 50).withColumn("batch", F.lit(k)),
            t,
            checkpoint_interval=2,
        )
    v, files, _m, _p, _t = _read_checkpoint(t)
    assert v >= 0 and files
    assert any(a.get("stats") for a in files.values())
    # post-checkpoint snapshot still exposes stats for skipping
    files2, _, _, _ = _snapshot(t)
    assert any(isinstance(a.get("stats"), str) for a in files2.values())


def test_iceberg_merge_upsert(spark, tmp_path):
    """Iceberg MERGE = one equality-delete commit + one append: matched
    keys re-image, unmatched insert, untouched rows survive, and the
    sequence-number rule keeps the append out of the delete's reach."""
    from hive_person_service_spark.sources.iceberg import (
        iceberg_merge,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "icemerge")
    base = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(20)],
        "id long, grp string, v double",
    )
    iceberg_write(base.repartition(3), t)
    src = spark.createDataFrame(
        [(5, "gX", 500.0), (7, "gY", 700.0), (100, "gZ", 1.0)],
        "id long, grp string, v double",
    )
    res = iceberg_merge(spark, t, src, keys=["id"])
    assert res == {"updated": 2, "inserted": 1}
    after = iceberg_scan(spark, t)
    assert after.count() == 21
    got = {r.id: (r.grp, r.v) for r in after.where("id IN (5,7,100)").collect()}
    assert got == {5: ("gX", 500.0), 7: ("gY", 700.0), 100: ("gZ", 1.0)}
    assert after.where("id = 6 AND v = 6.0").count() == 1
    assert after.groupBy("id").count().where("count > 1").count() == 0
    # re-merge: all three keys now exist -> 3 updates, 0 inserts
    res2 = iceberg_merge(spark, t, src, keys=["id"])
    assert res2 == {"updated": 3, "inserted": 0}
    assert iceberg_scan(spark, t).count() == 21
    with pytest.raises(ValueError, match="not unique"):
        iceberg_merge(spark, t, src.union(src), keys=["id"])


def test_delta_tail_stream_source(spark, tmp_path):
    """Streaming FROM Delta (the delta_tail Python DataSource): offsets
    are log versions -- an availableNow drain serves every pending
    version, checkpoint resume serves EXACTLY the new commits (no dups,
    no loss), change commits gate precisely, and skipChangeCommits skips
    them whole (delta-spark's semantics)."""
    from hive_person_service_spark.sources.delta_log import (
        delta_delete,
        delta_write,
    )
    from hive_person_service_spark.sources.delta_stream import (
        register_delta_tail,
    )

    t = str(tmp_path / "tail")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    for k in range(3):
        delta_write(
            spark.createDataFrame(
                [(k * 10 + i, float(i)) for i in range(5)], "id long, v double"
            ),
            t,
        )
    register_delta_tail(spark)

    def drain(src_opts=None, sink=out, ckpt=ck):
        r = spark.readStream.format("delta_tail").option("table", t)
        for k, v in (src_opts or {}).items():
            r = r.option(k, v)
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(90)

    drain()
    assert spark.read.parquet(out).count() == 15
    # batch face reads the same content
    b = spark.read.format("delta_tail").option("table", t).load()
    assert b.count() == 15
    # resume: only the new commit's rows arrive
    delta_write(spark.createDataFrame([(99, 9.9)], "id long, v double"), t)
    drain()
    df = spark.read.parquet(out)
    assert df.count() == 16
    assert df.where("id = 99").count() == 1
    assert df.groupBy("id").count().where("count > 1").count() == 0
    # a change commit fails the stream with the precise error...
    delta_delete(spark, t, "id = 1")
    with pytest.raises(Exception, match="changes existing data"):
        drain()
    # ...and skipChangeCommits skips it whole on a fresh checkpoint
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    drain({"skipChangeCommits": "true"}, sink=out2, ckpt=ck2)
    assert spark.read.parquet(out2).count() == 16  # delete commit skipped


def test_delta_tail_partitioned_table(spark, tmp_path):
    """Partition columns re-attach from add-action partitionValues in
    the tail rows (files don't physically contain them)."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.delta_log import delta_write
    from hive_person_service_spark.sources.delta_stream import (
        register_delta_tail,
    )

    t = str(tmp_path / "ptail")
    df = spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(12)],
        "id long, grp string, v double",
    )
    delta_write(df, t, partition_by=["grp"])
    register_delta_tail(spark)
    got = spark.read.format("delta_tail").option("table", t).load()
    assert set(got.columns) == {"id", "grp", "v"}
    assert {(r.id, r.grp) for r in got.collect()} == {
        (i, f"g{i % 3}") for i in range(12)
    }


def test_iceberg_tail_stream_source(spark, tmp_path):
    """iceberg_tail: snapshot-log-position offsets, availableNow drains
    all pending snapshots, checkpoint resume serves exactly the new
    appends, change snapshots gate unless skipChangeCommits."""
    from hive_person_service_spark.sources.delta_stream import (
        register_iceberg_tail,
    )
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete,
        iceberg_write,
    )

    t = str(tmp_path / "icetail")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    for k in range(3):
        iceberg_write(
            spark.createDataFrame(
                [(k * 10 + i, float(i)) for i in range(5)], "id long, v double"
            ),
            t,
        )
    register_iceberg_tail(spark)
    assert (
        spark.read.format("iceberg_tail").option("table", t).load().count()
        == 15
    )

    def drain(opts=None, sink=out, ckpt=ck):
        r = spark.readStream.format("iceberg_tail").option("table", t)
        for k, v in (opts or {}).items():
            r = r.option(k, v)
        q = (
            r.load()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(90)

    drain()
    assert spark.read.parquet(out).count() == 15
    iceberg_write(spark.createDataFrame([(99, 9.9)], "id long, v double"), t)
    drain()
    df = spark.read.parquet(out)
    assert df.count() == 16
    assert df.groupBy("id").count().where("count > 1").count() == 0
    iceberg_delete(spark, t, "id = 1")
    with pytest.raises(Exception, match="changes existing data"):
        drain()
    out2, ck2 = str(tmp_path / "out2"), str(tmp_path / "ck2")
    drain({"skipChangeCommits": "true"}, sink=out2, ckpt=ck2)
    assert spark.read.parquet(out2).count() == 16


def test_delta_change_data_feed_reconstruction(spark, tmp_path):
    """delta_changes reconstructs the per-commit change feed from the
    log: appends -> inserts, DV growth -> deletes of exactly the new
    positions, merge -> delete+insert pairs, overwrite -> file-retire
    deletes; version windows select sub-ranges; applying the feed in
    order reproduces HEAD."""
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.delta_log import (
        delta_changes,
        delta_delete,
        delta_merge,
        delta_scan,
        delta_write,
    )

    t = str(tmp_path / "cdf")
    base = spark.createDataFrame(
        [(i, float(i)) for i in range(12)], "id long, v double"
    )
    delta_write(base.repartition(2), t)                    # v0
    delta_delete(spark, t, "id IN (2, 4)")                 # v1
    src = spark.createDataFrame([(3, 300.0), (100, 1.0)], "id long, v double")
    delta_merge(spark, t, src, keys=["id"])                # v2 (del) + v3 (ins)
    ch = delta_changes(spark, t)
    by = {
        (r["_change_type"], r["_commit_version"]): r["count"]
        for r in ch.groupBy("_change_type", "_commit_version").count().collect()
    }
    assert by == {
        ("insert", 0): 12, ("delete", 1): 2, ("delete", 2): 1, ("insert", 3): 2,
    }
    # windowed read returns only the merge's changes
    w = sorted(
        (r.id, r._change_type, r._commit_version)
        for r in delta_changes(spark, t, starting_version=2).collect()
    )
    assert w == [(3, "delete", 2), (3, "insert", 3), (100, "insert", 3)]
    # replay: the latest change per (id, v) being an insert == HEAD
    head = {(r.id, r.v) for r in delta_scan(spark, t).collect()}
    applied = {
        (r.id, r.v)
        for r in ch.groupBy("id", "v")
        .agg(F.max_by("_change_type", "_commit_version").alias("ct"))
        .where("ct = 'insert'")
        .collect()
    }
    assert applied == head
    # overwrite retires files -> deletes of the remaining live rows
    delta_write(spark.createDataFrame([(1, 1.0)], "id long, v double"),
                t, mode="overwrite")                        # v4
    ow = delta_changes(spark, t, starting_version=4)
    got = sorted((r.id, r._change_type) for r in ow.collect())
    live_before = sorted(head)
    assert (1, "insert") in got
    assert {(i, "delete") for i, _v in live_before} <= set(got)
    with pytest.raises(ValueError, match="no commits"):
        delta_changes(spark, t, starting_version=99)


def test_delta_timestamp_time_travel(spark, tmp_path):
    import time as _time

    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
        _version_at_timestamp,
    )

    t = str(tmp_path / "tstravel")
    delta_write(spark.createDataFrame([(1,)], "id long"), t)
    _time.sleep(0.02)
    delta_write(spark.createDataFrame([(2,)], "id long"), t)
    lines = Path(t, "_delta_log", "00000000000000000000.json").read_text().splitlines()
    ts0 = next(
        json.loads(ln)["commitInfo"]["timestamp"] for ln in lines if "commitInfo" in ln
    )
    assert _version_at_timestamp(t, ts0) == 0
    assert delta_scan(spark, t, timestamp_as_of_ms=ts0).count() == 1
    assert delta_scan(spark, t, timestamp_as_of_ms=ts0 + 3_600_000).count() == 2
    with pytest.raises(ValueError, match="no commit at or before"):
        delta_scan(spark, t, timestamp_as_of_ms=ts0 - 10_000)
    with pytest.raises(ValueError, match="not both"):
        delta_scan(spark, t, version_as_of=0, timestamp_as_of_ms=ts0)
