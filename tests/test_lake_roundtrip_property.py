"""Seeded differential property test for the two table-format clients:
random dataframes (mixed types, nulls, duplicate keys) written through
Delta and Iceberg must scan back EXACTLY; random row-level deletes must
equal the equivalent filter on the source; merge must equal the
upsert reference computed relationally. One property run per seed, both
formats per seed -- the lake twin of the SQL fuzzer (tools/fuzz.py)."""

from __future__ import annotations

import random

import pytest


def _random_frame(spark, seed: int, n: int = 120):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                rng.choice(["alpha", "beta", "gamma", None]),
                None if rng.random() < 0.1 else round(rng.uniform(-1e4, 1e4), 2),
                rng.randrange(0, 7),
                rng.random() < 0.5,
            )
        )
    return spark.createDataFrame(
        rows, "id long, tag string, amount double, grp long, flag boolean"
    )


def _collect(df):
    return sorted(
        (r.id, r.tag, r.amount, r.grp, r.flag) for r in df.collect()
    )


@pytest.mark.parametrize("seed", [3, 17, 42, 101])
def test_roundtrip_and_delete_both_formats(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.delta_log import (
        delta_delete,
        delta_scan,
        delta_write,
    )
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete,
        iceberg_scan,
        iceberg_write,
    )

    src = _random_frame(spark, seed).localCheckpoint(eager=True)
    rng = random.Random(seed * 7 + 1)
    cut = rng.randrange(0, 7)
    pred = f"grp = {cut} AND flag"

    dt = str(tmp_path / f"d{seed}")
    it = str(tmp_path / f"i{seed}")
    delta_write(src.repartition(3), dt)
    iceberg_write(src.repartition(3), it)
    assert _collect(delta_scan(spark, dt)) == _collect(src)
    assert _collect(iceberg_scan(spark, it)) == _collect(src)

    expected = _collect(src.where(f"NOT ({pred}) OR ({pred}) IS NULL"))
    delta_delete(spark, dt, pred)
    iceberg_delete(spark, it, pred)
    assert _collect(delta_scan(spark, dt)) == expected
    assert _collect(iceberg_scan(spark, it)) == expected


@pytest.mark.parametrize("seed", [5, 23])
def test_merge_matches_relational_reference(spark, tmp_path, seed):
    from pyspark.sql import functions as F

    from hive_person_service_spark.sources.delta_log import (
        delta_merge,
        delta_scan,
        delta_write,
    )
    from hive_person_service_spark.sources.iceberg import (
        iceberg_merge,
        iceberg_scan,
        iceberg_write,
    )

    base = _random_frame(spark, seed).localCheckpoint(eager=True)
    # source: re-image a random half of existing ids + brand-new ids
    rng = random.Random(seed * 13 + 5)
    upd_ids = sorted(rng.sample(range(120), 40))
    source = (
        base.where(F.col("id").isin(upd_ids))
        .withColumn("amount", F.col("id").cast("double") * 2)
        .unionByName(
            _random_frame(spark, seed + 1000, 15).withColumn(
                "id", F.col("id") + 10_000
            )
        )
        .localCheckpoint(eager=True)
    )
    # relational reference: source wins on key, else target
    ref = _collect(
        base.join(source.select("id"), "id", "left_anti").unionByName(source)
    )

    dt, it = str(tmp_path / f"dm{seed}"), str(tmp_path / f"im{seed}")
    delta_write(base.repartition(3), dt)
    iceberg_write(base.repartition(3), it)
    rd = delta_merge(spark, dt, source, keys=["id"])
    ri = iceberg_merge(spark, it, source, keys=["id"])
    assert rd == ri == {"updated": 40, "inserted": 15}
    assert _collect(delta_scan(spark, dt)) == ref
    assert _collect(iceberg_scan(spark, it)) == ref
