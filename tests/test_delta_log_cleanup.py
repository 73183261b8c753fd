import shutil
import pytest
from hive_person_service_spark.sources.delta_log import (
    delta_changes, delta_cleanup_log, delta_history, delta_scan, delta_write,
    write_checkpoint_v2, _list_versions,
)

def _fresh(tmp_path, name):
    p = str(tmp_path / name); shutil.rmtree(p, ignore_errors=True); return p

def test_cleanup_log_truncates_safely(spark, tmp_path):
    t = _fresh(tmp_path, "dlog")
    for lo in range(0, 40, 10):
        delta_write(spark.createDataFrame(
            [(i, float(i)) for i in range(lo, lo+10)], "id long, v double"), t)
    write_checkpoint_v2(t)
    head = sorted(r["id"] for r in delta_scan(spark, t).collect())
    deleted = delta_cleanup_log(t)
    assert len(deleted) == 3  # versions 0..2 (< checkpoint at 3)
    assert _list_versions(t)[0] == 3
    assert sorted(r["id"] for r in delta_scan(spark, t).collect()) == head
    with pytest.raises(ValueError, match="log truncated"):
        delta_scan(spark, t, version_as_of=1).collect()
    with pytest.raises(ValueError, match="log truncated"):
        delta_changes(spark, t, starting_version=0)
    assert delta_changes(spark, t, starting_version=3).count() >= 0
    assert [h["version"] for h in delta_history(t)] == [3]
    delta_write(spark.createDataFrame([(99, 9.0)], "id long, v double"), t)
    assert 99 in {r["id"] for r in delta_scan(spark, t).collect()}
    assert delta_cleanup_log(t, keep_versions=10) == []
