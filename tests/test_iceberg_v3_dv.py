"""Behavioral pins for Iceberg v3 deletion vectors (sources/puffin.py +
iceberg_delete_dv / the DV read path in sources/iceberg.py): Puffin
framing, deletion-vector-v1 blob golden bytes, the replacement rule
(a new DV folds in every earlier delete of its file and the reader
ignores superseded position-delete rows), data-file immutability,
re-delete idempotence, changelog attribution, and the format gate."""

from __future__ import annotations

import hashlib
import json
import struct
import zlib

import numpy as np
import pytest


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def _file_digests(table: str) -> dict:
    import os

    out = {}
    data = os.path.join(table, "data")
    for name in sorted(os.listdir(data)):
        if name.endswith(".parquet") and not name.startswith("delete-"):
            with open(os.path.join(data, name), "rb") as fh:
                out[name] = hashlib.sha1(fh.read()).hexdigest()
    return out


# ---------------------------------------------------------------------------
# codec layer
# ---------------------------------------------------------------------------


def test_dv_blob_golden_framing():
    from hive_person_service_spark.sources.delta_dv import serialize_bitmap
    from hive_person_service_spark.sources.puffin import (
        frame_dv_blob,
        unframe_dv_blob,
    )

    positions = [0, 1, 5, 100, 2**33 + 7]
    blob = frame_dv_blob(positions)
    vector = serialize_bitmap(positions)
    # length word covers DV magic + vector; crc is CRC-32 of magic+vector
    assert blob[:4] == struct.pack(">i", 4 + len(vector))
    assert blob[4:8] == b"\xd1\xd3\x3d\xd3"
    assert blob[8 : 8 + len(vector)] == vector
    body = blob[4 : 8 + len(vector)]
    assert blob[-4:] == struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
    assert unframe_dv_blob(blob).tolist() == sorted(positions)


def test_dv_blob_corruption_detected():
    from hive_person_service_spark.sources.puffin import (
        frame_dv_blob,
        unframe_dv_blob,
    )

    blob = bytearray(frame_dv_blob([1, 2, 3]))
    blob[10] ^= 0xFF
    with pytest.raises(ValueError, match="checksum|magic"):
        unframe_dv_blob(bytes(blob))


def test_puffin_roundtrip(tmp_path):
    from hive_person_service_spark.sources.puffin import (
        frame_dv_blob,
        read_dv_from_puffin,
        read_puffin_footer,
        write_puffin,
    )

    p = str(tmp_path / "x.puffin")
    metas = write_puffin(
        p,
        [
            {
                "type": "deletion-vector-v1",
                "data": frame_dv_blob([3, 4, 5]),
                "properties": {"referenced-data-file": "/a.parquet",
                               "cardinality": "3"},
            },
            {
                "type": "deletion-vector-v1",
                "data": frame_dv_blob([0, 2**40]),
                "properties": {"referenced-data-file": "/b.parquet",
                               "cardinality": "2"},
            },
        ],
    )
    foot = read_puffin_footer(p)
    assert [b["type"] for b in foot["blobs"]] == ["deletion-vector-v1"] * 2
    assert foot["blobs"][0]["offset"] == 4  # right after the leading magic
    got0 = read_dv_from_puffin(p, metas[0]["offset"], metas[0]["length"])
    got1 = read_dv_from_puffin(p, metas[1]["offset"], metas[1]["length"])
    assert got0.tolist() == [3, 4, 5]
    assert got1.tolist() == [0, 2**40]
    # file-level magic checks bite on junk
    with open(str(tmp_path / "junk"), "wb") as fh:
        fh.write(b"nope")
    with pytest.raises(ValueError, match="not a Puffin"):
        read_puffin_footer(str(tmp_path / "junk"))


# ---------------------------------------------------------------------------
# table layer
# ---------------------------------------------------------------------------


def test_dv_delete_supersedes_and_preserves_files(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        _load_metadata,
        _plan_snapshot,
        iceberg_delete,
        iceberg_delete_dv,
        iceberg_scan,
    )
    from hive_person_service_spark.sources.iceberg import iceberg_write
    from hive_person_service_spark.sources.puffin import read_dv_from_puffin

    t = str(tmp_path / "t")
    rows = [(i, "even" if i % 2 == 0 else "odd", float(i)) for i in range(20)]
    # one file per commit so the per-file position math below is exact
    iceberg_write(_mk(spark, rows[:10]).coalesce(1), t)
    iceberg_write(_mk(spark, rows[10:]).coalesce(1), t)
    before = _file_digests(t)

    # generation 1: v2 position delete of ids 0-4
    assert iceberg_delete(spark, t, "id < 5") == 5
    # generation 2: v3 DV delete of odd ids
    n = iceberg_delete_dv(spark, t, "grp = 'odd'")
    assert n == 8  # odd ids 5..19 except 1,3 (already gone)

    meta = _load_metadata(t)
    assert meta["format-version"] == 3
    live = {r.id for r in iceberg_scan(spark, t).collect()}
    assert live == {6, 8, 10, 12, 14, 16, 18}

    # the replacement rule: each DV bitmap holds ALL deleted positions of
    # its file, including the v2 generation's
    plan = _plan_snapshot(t, meta, None)
    total_marked = sum(
        len(read_dv_from_puffin(pf, off, size))
        for pf, off, size, _seq in plan["dv"].values()
    )
    assert total_marked == 13  # 5 from the v2 commit + 8 new

    # merge-on-read: no data file was rewritten
    assert _file_digests(t) == before

    # idempotence: re-deleting the same predicate is a no-op commit
    assert iceberg_delete_dv(spark, t, "grp = 'odd'") == 0


def test_dv_only_table_and_time_travel(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        iceberg_delete_dv,
        iceberg_scan,
        iceberg_snapshots,
        iceberg_write,
    )

    t = str(tmp_path / "t")
    iceberg_write(_mk(spark, [(i, "g", float(i)) for i in range(8)]), t)
    s0 = iceberg_snapshots(t)[-1]["snapshot_id"]
    iceberg_delete_dv(spark, t, "id >= 6")
    iceberg_delete_dv(spark, t, "id = 0")  # second DV generation
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {1, 2, 3, 4, 5}
    # pre-delete snapshot still reconstructs in full
    assert len(iceberg_scan(spark, t, snapshot_id=s0).collect()) == 8
    # appends after DVs: new rows never touched by old bitmaps
    iceberg_write(_mk(spark, [(100, "g", 1.0)]), t)
    assert {r.id for r in iceberg_scan(spark, t).collect()} == {
        1, 2, 3, 4, 5, 100,
    }


def test_dv_changelog_attribution(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        iceberg_changes,
        iceberg_delete_dv,
        iceberg_snapshots,
        iceberg_write,
    )

    t = str(tmp_path / "t")
    iceberg_write(_mk(spark, [(i, "g", float(i)) for i in range(6)]), t)
    iceberg_delete_dv(spark, t, "id < 2")
    iceberg_delete_dv(spark, t, "id = 3")  # replacement DV, one new position
    snaps = [s["snapshot_id"] for s in iceberg_snapshots(t)]
    full = iceberg_changes(spark, t).collect()
    dels = sorted(r.id for r in full if r._change_type == "delete")
    ins = sorted(r.id for r in full if r._change_type == "insert")
    assert ins == [0, 1, 2, 3, 4, 5]
    assert dels == [0, 1, 3]  # each deleted row attributed exactly once
    # windowed: only the second DV commit -> only id 3
    win = iceberg_changes(spark, t, from_snapshot_id=snaps[1]).collect()
    assert sorted(r.id for r in win if r._change_type == "delete") == [3]
    assert not [r for r in win if r._change_type == "insert"]


def test_format_version_gate(tmp_path):
    from hive_person_service_spark.sources.iceberg import _load_metadata

    d = tmp_path / "t" / "metadata"
    d.mkdir(parents=True)
    (d / "v1.metadata.json").write_text(json.dumps({"format-version": 4}))
    with pytest.raises(ValueError, match="format-version 4"):
        _load_metadata(str(tmp_path / "t"))


def test_compressed_puffin_footer_gate(tmp_path):
    from hive_person_service_spark.sources.puffin import (
        read_puffin_footer,
        write_puffin,
    )

    p = str(tmp_path / "x.puffin")
    write_puffin(p, [])
    # flip the compressed-footer flag byte in place
    with open(p, "r+b") as fh:
        fh.seek(-8, 2)
        fh.write(b"\x01")
    with pytest.raises(ValueError, match="lz4"):
        read_puffin_footer(p)


def test_puffin_statistics_roundtrip_and_gates(spark, tmp_path):
    import struct

    from hive_person_service_spark.sources.iceberg import (
        _load_metadata,
        iceberg_ndv,
        iceberg_write,
        iceberg_write_stats,
    )
    from hive_person_service_spark.sources.puffin import (
        read_puffin_blob,
        read_puffin_footer,
    )

    t = str(tmp_path / "t")
    rows = [(i, f"g{i % 7}", float(i)) for i in range(200)]
    iceberg_write(_mk(spark, rows), t)
    est = iceberg_write_stats(spark, t, ["id", "grp"], k=16)
    # under-full sketch -> exact; full sketch -> estimate near truth
    assert est["grp"] == 7.0
    assert 100 <= est["id"] <= 400  # k=16 KMV: loose but sane
    # metadata-only read-back matches what the writer reported
    assert iceberg_ndv(t) == est
    # the blob payload IS the sketch state: k little-endian u32 minima
    meta = _load_metadata(t)
    entry = meta["statistics"][0]
    blob_id = next(
        b for b in entry["blob-metadata"]
        if (b["properties"] or {}).get("column") == "id"
    )
    raw = read_puffin_blob(
        entry["statistics-path"], blob_id["offset"], blob_id["length"]
    )
    hs = list(struct.unpack(f"<{len(raw) // 4}I", raw))
    assert len(hs) == 16 and hs == sorted(hs)
    foot = read_puffin_footer(entry["statistics-path"])
    assert all(
        b["type"] == "hive-person-service-spark.kmv-ndv-v1"
        for b in foot["blobs"]
    )
    # unknown column + missing stats gates
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in schema"):
        iceberg_write_stats(spark, t, ["nope"])
    with _pytest.raises(ValueError, match="no statistics registered"):
        iceberg_ndv(t, snapshot_id=12345)


# ---------------------------------------------------------------------------
# Round 11: v3 row lineage
# ---------------------------------------------------------------------------


def test_row_lineage_ids_and_sequence(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        _load_metadata,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "rl")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    )
    iceberg_write(df.repartition(1).sortWithinPartitions("id"), t,
                  row_lineage=True)
    meta = _load_metadata(t)
    assert meta["format-version"] == 3
    assert meta["next-row-id"] == 20
    assert meta["snapshots"][-1]["first-row-id"] == 0
    rows = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in iceberg_scan(spark, t, with_row_lineage=True).collect()
    }
    assert [rows[i][0] for i in range(20)] == list(range(20))
    assert {v for _r, v in rows.values()} == {1}
    # second append: fresh ids continue from next-row-id, seq advances
    iceberg_write(
        spark.createDataFrame(
            [(i, float(i)) for i in range(20, 30)], "id long, v double"
        ).repartition(1).sortWithinPartitions("id"),
        t,
    )
    meta = _load_metadata(t)
    assert meta["next-row-id"] == 30
    assert meta["snapshots"][-1]["first-row-id"] == 20
    rows = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in iceberg_scan(spark, t, with_row_lineage=True).collect()
    }
    assert [rows[i][0] for i in sorted(rows)] == list(range(30))
    assert {rows[i][1] for i in range(20)} == {1}
    assert {rows[i][1] for i in range(20, 30)} == {2}
    # plain scans never leak lineage columns
    assert sorted(iceberg_scan(spark, t).columns) == ["id", "v"]


def test_row_lineage_survives_delete_and_compaction(spark, tmp_path):
    from hive_person_service_spark.sources.iceberg import (
        iceberg_compact,
        iceberg_delete,
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "rlc")
    df = spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id long, v double"
    )
    iceberg_write(df.repartition(1).sortWithinPartitions("id"), t,
                  row_lineage=True)
    iceberg_delete(spark, t, "id % 5 = 0")
    rows = {
        r["id"]: r["_row_id"]
        for r in iceberg_scan(spark, t, with_row_lineage=True).collect()
    }
    # position delete leaves the file alone: survivors keep their ids
    assert rows == {i: i for i in range(20) if i % 5 != 0}
    res = iceberg_compact(spark, t)
    assert res["files_after"] == 1
    after = {
        r["id"]: (r["_row_id"], r["_last_updated_sequence_number"])
        for r in iceberg_scan(spark, t, with_row_lineage=True).collect()
    }
    # the rewrite materialized lineage: ids preserved, and the sequence
    # number still names the commit that last WROTE the rows (1), not
    # the compaction
    assert {i: rid for i, (rid, _s) in after.items()} == rows
    assert {s for _r, s in after.values()} == {1}
    # plain scan of the compacted table stays clean
    assert sorted(iceberg_scan(spark, t).columns) == ["id", "v"]
    assert iceberg_scan(spark, t).count() == 16


def test_row_lineage_requires_creation_flag(spark, tmp_path):
    import pytest as _pytest

    from hive_person_service_spark.sources.iceberg import (
        iceberg_scan,
        iceberg_write,
    )

    t = str(tmp_path / "rl_off")
    iceberg_write(
        spark.createDataFrame([(1, 1.0)], "id long, v double"), t
    )
    with _pytest.raises(ValueError, match="row_lineage"):
        iceberg_scan(spark, t, with_row_lineage=True)
    with _pytest.raises(ValueError, match="creation"):
        iceberg_write(
            spark.createDataFrame([(2, 2.0)], "id long, v double"), t,
            row_lineage=True,
        )
