"""Behavioral pins for the round-5 source surface: Avro OCF codec
round-trips (bytes, nulls, timestamps, arrays, both codecs), distributed
write/read through Spark, and JDBC federation pushdown + partitioned-scan
shape. Oracle agreement for the declared queries is covered generically
by test_oracle.py / tools/selfcheck.py."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_ocf_codec_roundtrip_all_types():
    from hive_person_service_spark.sources.avro_ocf import (
        read_ocf,
        spark_to_avro_schema,
        write_ocf,
    )
    from pyspark.sql.types import (
        ArrayType,
        BooleanType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    st = StructType(
        [
            StructField("k", LongType()),
            StructField("s", StringType()),
            StructField("d", DoubleType()),
            StructField("i", IntegerType()),
            StructField("b", BooleanType()),
            StructField("arr", ArrayType(FloatType())),
        ]
    )
    sch = spark_to_avro_schema(st)
    recs = [
        {"k": 1, "s": "héllo, wörld", "d": 3.5, "i": -7, "b": True,
         "arr": [1.0, 2.5]},
        {"k": None, "s": None, "d": None, "i": None, "b": None, "arr": None},
        {"k": -(2**53), "s": "", "d": -0.0, "i": 2**31 - 1, "b": False,
         "arr": []},
    ]
    for codec in ("null", "deflate"):
        blob = write_ocf(recs, sch, codec=codec)
        got_schema, got = read_ocf(blob)
        assert got_schema == sch
        assert got == recs


def test_ocf_multiblock_and_corruption():
    from hive_person_service_spark.sources.avro_ocf import (
        read_ocf,
        write_ocf,
    )

    sch = {
        "type": "record",
        "name": "row",
        "fields": [{"name": "x", "type": ["null", "long"]}],
    }
    recs = [{"x": i} for i in range(10_000)]
    blob = write_ocf(recs, sch, codec="deflate", block_records=1000)
    _, got = read_ocf(blob)
    assert got == recs  # 10 blocks stitched back in order
    # flipping a sync-marker byte must be detected, not silently misread
    bad = bytearray(blob)
    bad[-3] ^= 0xFF
    with pytest.raises(ValueError, match="sync marker"):
        read_ocf(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        read_ocf(b"PAR1" + blob[4:])


def test_ocf_property_roundtrip():
    """Property test: random records over the full supported type surface
    round-trip bit-exactly through both codecs."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hive_person_service_spark.sources.avro_ocf import read_ocf, write_ocf

    sch = {
        "type": "record",
        "name": "row",
        "fields": [
            {"name": "l", "type": ["null", "long"]},
            {"name": "i", "type": ["null", "int"]},
            {"name": "d", "type": ["null", "double"]},
            {"name": "s", "type": ["null", "string"]},
            {"name": "b", "type": ["null", "bytes"]},
            {"name": "f", "type": ["null", "boolean"]},
            {"name": "a", "type": ["null", {"type": "array", "items": ["null", "long"]}]},
        ],
    }
    rec = st.fixed_dictionaries(
        {
            "l": st.none() | st.integers(-(2**63), 2**63 - 1),
            "i": st.none() | st.integers(-(2**31), 2**31 - 1),
            "d": st.none()
            | st.floats(allow_nan=False, allow_infinity=True, width=64),
            "s": st.none() | st.text(max_size=40),
            "b": st.none() | st.binary(max_size=40),
            "f": st.none() | st.booleans(),
            "a": st.none()
            | st.lists(st.none() | st.integers(-(2**40), 2**40), max_size=5),
        }
    )

    @settings(max_examples=150, deadline=None)
    @given(st.lists(rec, max_size=20), st.sampled_from(["null", "deflate"]))
    def roundtrip(records, codec):
        _, got = read_ocf(write_ocf(records, sch, codec=codec, block_records=7))
        assert got == records

    roundtrip()


def test_avro_spark_roundtrip_exact(spark, tmp_path):
    """Distributed write (one OCF per partition) -> distributed read ->
    exact row set, timestamps included (orders has TimestampType)."""
    from hive_person_service_spark.sources import SCHEMAS, load_table
    from hive_person_service_spark.sources.avro_ocf import (
        read_avro,
        write_avro,
    )

    o = load_table(spark, SF_SMALL, "orders").repartition(4)
    path = str(tmp_path / "orders_avro")
    n_files = write_avro(o, path, codec="deflate")
    assert 1 <= n_files <= 4
    back = read_avro(spark, path, SCHEMAS["orders"])
    assert back.schema == SCHEMAS["orders"]
    a = {tuple(r) for r in o.collect()}
    b = {tuple(r) for r in back.collect()}
    assert a == b


def test_jdbc_federation_pushdown_and_partitions(spark):
    """The federation read must (a) push the filter into the remote scan
    (PushedFilters in the JDBCRelation node) and (b) scan in 4 range
    partitions, not one serial cursor."""
    from hive_person_service_spark.plans.pipeline44 import _jdbc_supplier

    s = _jdbc_supplier(spark, SF_SMALL)
    assert s.rdd.getNumPartitions() == 4
    filtered = s.where(F.col("s_acctbal") > 0)
    plan = filtered._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "PushedFilters" in plan
    assert "s_acctbal" in plan  # the predicate reached the JDBC scan
    # and the rows agree with the parquet source
    from hive_person_service_spark.sources import load_table

    sup = load_table(spark, SF_SMALL, "supplier")
    assert filtered.count() == sup.where(F.col("s_acctbal") > 0).count()


def test_ocf_array_with_null_elements_roundtrips():
    """Spark arrays default to containsNull=True -- a null ELEMENT must
    round-trip (items are emitted as a [null, T] union), not crash the
    encoder with int(None)."""
    from pyspark.sql import types as T

    from hive_person_service_spark.sources.avro_ocf import (
        read_ocf,
        spark_to_avro_schema,
        write_ocf,
    )

    struct = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("xs", T.ArrayType(T.LongType(), containsNull=True)),
            T.StructField(
                "ys", T.ArrayType(T.DoubleType(), containsNull=False)
            ),
        ]
    )
    sch = spark_to_avro_schema(struct)
    # containsNull=True -> union items; containsNull=False -> bare items
    xs_items = next(f for f in sch["fields"] if f["name"] == "xs")["type"][1]["items"]
    ys_items = next(f for f in sch["fields"] if f["name"] == "ys")["type"][1]["items"]
    assert xs_items == ["null", "long"]
    assert ys_items == "double"
    recs = [
        {"id": 1, "xs": [1, None, 3], "ys": [1.5, 2.5]},
        {"id": 2, "xs": None, "ys": []},
        {"id": 3, "xs": [], "ys": [0.0]},
    ]
    _, got = read_ocf(write_ocf(recs, sch))
    assert got == recs
