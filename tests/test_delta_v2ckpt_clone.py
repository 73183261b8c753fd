"""Behavioral pins for Delta V2 (UUID-named) checkpoints and SHALLOW
CLONE (sources/delta_log.py): sidecar reconstruction equals JSON replay,
txn idempotence state survives the checkpoint, precise gates (missing
sidecar, JSON manifest), clone zero-copy + copy-on-write isolation, and
the clone gates."""

from __future__ import annotations

import json
import os

import pytest


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, grp string, v double")


def test_v2_checkpoint_reconstruction_and_txn(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        _read_checkpoint,
        delta_scan,
        delta_txn_version,
        delta_write,
        write_checkpoint_v2,
    )

    t = str(tmp_path / "t")
    for k in range(3):
        delta_write(_mk(spark, [(10 * k + i, "g", 1.0) for i in range(4)]),
                    t, mode="append")
    delta_write(_mk(spark, [(90, "g", 1.0)]), t, mode="append",
                txn=("appA", 7))
    expect = {r.id for r in delta_scan(spark, t).collect()}

    info = write_checkpoint_v2(t, n_sidecars=2)
    assert info["version"] == 3 and len(info["sidecars"]) == 2
    v, files, meta, proto, txns = _read_checkpoint(t)
    assert v == 3 and len(files) > 0 and meta.get("schemaString")
    assert txns == {"appA": 7}

    # scan THROUGH the checkpoint (plus one post-checkpoint commit)
    delta_write(_mk(spark, [(99, "g", 1.0)]), t, mode="append")
    got = {r.id for r in delta_scan(spark, t).collect()}
    assert got == expect | {99}
    # idempotence marker still served after the pre-checkpoint JSON would
    # be retention-deleted (it reads from the checkpoint's txn rows)
    assert delta_txn_version(t, "appA") == 7
    # time travel below the checkpoint replays JSON exactly
    assert len(delta_scan(spark, t, version_as_of=0).collect()) == 4


def test_v2_checkpoint_gates(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_scan,
        delta_write,
        write_checkpoint_v2,
    )

    t = str(tmp_path / "t")
    delta_write(_mk(spark, [(1, "g", 1.0)]), t, mode="append")
    delta_write(_mk(spark, [(2, "g", 2.0)]), t, mode="append")
    info = write_checkpoint_v2(t, n_sidecars=1)
    side = os.path.join(t, "_delta_log", "_sidecars", info["sidecars"][0])
    os.rename(side, side + ".gone")
    with pytest.raises(ValueError, match="sidecar missing"):
        delta_scan(spark, t)
    os.rename(side + ".gone", side)
    assert len(delta_scan(spark, t).collect()) == 2

    # JSON-manifest v2 checkpoints gate precisely
    man = os.path.join(t, "_delta_log", info["manifest"])
    os.remove(man)
    with open(man.replace(".parquet", ".json"), "w") as fh:
        fh.write("{}\n")
    with pytest.raises(ValueError, match="JSON"):
        delta_scan(spark, t)


def test_shallow_clone_zero_copy_isolation(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_clone,
        delta_delete,
        delta_scan,
        delta_write,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    delta_write(_mk(spark, [(i, "g", float(i)) for i in range(10)]), src,
                mode="append")
    delta_write(_mk(spark, [(i, "g", float(i)) for i in range(10, 14)]), src,
                mode="append")

    def src_files():
        out = {}
        for dirpath, _d, names in os.walk(src):
            if "_delta_log" in dirpath:
                continue
            for n in names:
                if n.endswith(".parquet"):
                    p = os.path.join(dirpath, n)
                    out[p] = (os.path.getsize(p), os.path.getmtime(p))
        return out

    before = src_files()
    delta_clone(src, dst)
    # the clone dir holds NO parquet of its own -- pure metadata
    clone_parquet = [
        n for _dp, _d, names in os.walk(dst) for n in names
        if n.endswith(".parquet")
    ]
    assert clone_parquet == []
    assert {r.id for r in delta_scan(spark, dst).collect()} == set(range(14))

    # copy-on-write isolation: clone-local DV delete, source untouched
    delta_delete(spark, dst, "id < 5")
    assert {r.id for r in delta_scan(spark, dst).collect()} == set(range(5, 14))
    assert {r.id for r in delta_scan(spark, src).collect()} == set(range(14))
    assert src_files() == before

    # provenance recorded
    log0 = os.path.join(dst, "_delta_log", "00000000000000000000.json")
    metas = [
        json.loads(line)["metaData"]
        for line in open(log0)
        if line.strip() and "metaData" in json.loads(line)
    ]
    assert metas[0]["configuration"]["clonedFrom"] == src


def test_shallow_clone_gates(spark, tmp_path):
    from hive_person_service_spark.sources.delta_log import (
        delta_clone,
        delta_delete,
        delta_write,
    )

    src = str(tmp_path / "src")
    delta_write(_mk(spark, [(i, "g", 1.0) for i in range(6)]), src,
                mode="append")
    dst = str(tmp_path / "dst")
    delta_clone(src, dst)
    with pytest.raises(ValueError, match="already exists"):
        delta_clone(src, dst)

    delta_delete(spark, src, "id = 0")
    with pytest.raises(ValueError, match="deletion vectors"):
        delta_clone(src, str(tmp_path / "dst2"))

    part = str(tmp_path / "part")
    delta_write(_mk(spark, [(1, "a", 1.0), (2, "b", 2.0)]), part,
                mode="append", partition_by=["grp"])
    with pytest.raises(ValueError, match="partition"):
        delta_clone(part, str(tmp_path / "dst3"))
