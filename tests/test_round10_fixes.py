"""Round-10 ADVICE regressions: hudi stats datetime coercion, bloom
lookup representations, hive_acid minor-compaction no-op signaling,
delta CDF gap detection."""

import datetime as dt
import os
import shutil

import pytest

from hive_person_service_spark.sources.hudi import (
    _bloom_build,
    _bloom_may_contain,
    _key_reprs,
    _stats_may_match,
)
from hive_person_service_spark.sources.hive_acid import (
    hive_acid_compact,
    hive_acid_insert,
)
from hive_person_service_spark.sources.delta_log import (
    delta_changes,
    delta_write,
    _list_versions,
)


def _fresh(tmp_path, name):
    p = str(tmp_path / name)
    shutil.rmtree(p, ignore_errors=True)
    return p


# --------------------------------------------------------------------------
# hudi: _stats_may_match temporal coercion (ADVICE medium)
# --------------------------------------------------------------------------


def test_stats_second_precision_equality_not_pruned():
    """A second-precision datetime '=' lookup against microsecond-stamped
    stats must KEEP the file (was pruned: the value was a strict
    lexicographic prefix of the min)."""
    entry = {"ts": {"min": "2020-01-01T00:00:00.000000",
                    "max": "2020-01-02T00:00:00.000000"}}
    assert _stats_may_match(entry, [("ts", "=", dt.datetime(2020, 1, 1))])
    assert _stats_may_match(
        entry, [("ts", "=", "2020-01-01 00:00:00")]
    )
    # genuinely out-of-range still prunes
    assert not _stats_may_match(
        entry, [("ts", "=", dt.datetime(2019, 12, 31))]
    )
    assert not _stats_may_match(entry, [("ts", ">", "2020-01-02 00:00:00")])


def test_stats_plain_strings_with_colons_not_mangled():
    """String columns whose values contain ':' and spaces compare
    verbatim (the old space->T rewrite corrupted them)."""
    entry = {"s": {"min": "a:b c", "max": "a:b e"}}
    assert _stats_may_match(entry, [("s", "=", "a:b d")])
    assert not _stats_may_match(entry, [("s", "=", "a:b f")])
    # ambiguous representation (non-ISO value vs ISO bounds): keep
    iso = {"ts": {"min": "2020-01-01", "max": "2020-06-01"}}
    assert _stats_may_match(iso, [("ts", "=", "not-a-date")])
    # date-typed stats vs datetime lookup: parsed compare, date promoted
    assert _stats_may_match(
        iso, [("ts", ">=", dt.datetime(2020, 3, 1, 12))]
    )
    assert not _stats_may_match(iso, [("ts", ">", "2020-06-01 00:00:00")])


# --------------------------------------------------------------------------
# hudi: bloom lookup representations (ADVICE low)
# --------------------------------------------------------------------------


def test_bloom_reprs_cover_numeric_cast_mismatch():
    assert "115.0" in _key_reprs(115)
    assert "115" in _key_reprs(115.0)
    assert _key_reprs(True) == ["true"]
    # a double-typed key stored as '115.0' is found by an int lookup
    entry = _bloom_build(["115.0"])
    assert any(_bloom_may_contain(entry, r) for r in _key_reprs(115))
    # and an int-typed key stored as '7' is found by a float lookup
    entry2 = _bloom_build(["7"])
    assert any(_bloom_may_contain(entry2, r) for r in _key_reprs(7.0))


# --------------------------------------------------------------------------
# hive_acid: minor compaction no-op + per-tier ranges (ADVICE low)
# --------------------------------------------------------------------------


def test_minor_compaction_noop_and_ranges(spark, tmp_path):
    t = _fresh(tmp_path, "acid_minor")
    df = spark.createDataFrame([(1, 1.0)], "id long, v double")
    hive_acid_insert(spark, t, df, key_col="id")
    # one delta, no delete-deltas: nothing qualifies -> explicit no-op
    res = hive_acid_compact(spark, t, mode="minor")
    assert res["noop"] is True and res["write_id"] is None
    assert res["folded"] == 0 and res["merged"] == {}
    assert os.path.isdir(os.path.join(t, "delta_1_1"))  # untouched
    # two deltas: merged range reported per tier, write_id = max hi
    hive_acid_insert(spark, t,
                     spark.createDataFrame([(2, 2.0)], "id long, v double"),
                     key_col="id")
    res = hive_acid_compact(spark, t, mode="minor")
    assert res["noop"] is False and res["write_id"] == 2
    assert res["merged"] == {"delta": (1, 2)}


# --------------------------------------------------------------------------
# delta: CDF refuses a log with gaps (ADVICE low)
# --------------------------------------------------------------------------


def test_changes_refuses_gapped_log(spark, tmp_path):
    t = _fresh(tmp_path, "dlog_gap")
    for lo in range(0, 30, 10):
        delta_write(
            spark.createDataFrame(
                [(i, float(i)) for i in range(lo, lo + 10)],
                "id long, v double",
            ),
            t,
        )
    assert _list_versions(t) == [0, 1, 2]
    # simulate a partial copy: commit 1's JSON vanishes
    os.remove(os.path.join(t, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(ValueError, match="gaps"):
        delta_changes(spark, t, starting_version=0)
