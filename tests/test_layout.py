"""Z-order layout: key interleaving correctness + file-level clustering
effect (min/max spans per file shrink vs unordered writes)."""

from __future__ import annotations

import pathlib

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.layout import zorder_key, zorder_write
from hive_person_service_spark.sources import load_table


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 3)], "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
        ).collect()
    }
    # bit layout: z = y1 x1 y0 x0
    assert got == {(0, 0): 0, (1, 0): 1, (0, 1): 2, (3, 3): 15}


def _file_spans(path: str, col: str) -> float:
    """Mean (max-min) span of `col` across parquet files -- smaller means
    better clustering for range predicates on that column."""
    spans = []
    for f in pathlib.Path(path).glob("*.parquet"):
        md = pq.ParquetFile(f).metadata
        schema_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        i = schema_idx[col]
        lo = min(md.row_group(g).column(i).statistics.min for g in range(md.num_row_groups))
        hi = max(md.row_group(g).column(i).statistics.max for g in range(md.num_row_groups))
        spans.append(hi - lo)
    return sum(spans) / len(spans)


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    li = load_table(spark, SF_SMALL, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    plain, zpath = str(tmp_path / "plain"), str(tmp_path / "z")
    li.repartition(8).write.parquet(plain)
    zorder_write(li, zpath, ["l_orderkey", "l_partkey"], bits=10, n_files=8)

    assert spark.read.parquet(zpath).count() == li.count()
    # random 8-way split leaves each file spanning ~the full key range;
    # z-ordered files must span a fraction of it on BOTH dimensions
    for col in ("l_orderkey", "l_partkey"):
        assert _file_spans(zpath, col) < 0.7 * _file_spans(plain, col), col
