"""Multi-format ingest (Hive SerDe surface, SURVEY.md §2.A): CSV / JSON /
ORC readers with explicit schemas (schema-on-read, never inference -- at
100 TB inference is an extra full scan and a type-drift hazard)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..session import configure


def read_csv(
    spark: SparkSession, path: str, schema: StructType, header: bool = True
) -> DataFrame:
    """CSV with declared schema (Hive LazySimpleSerDe analog)."""
    configure(spark)
    return spark.read.schema(schema).option("header", str(header).lower()).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """JSON-lines with declared schema (Hive JsonSerDe analog)."""
    configure(spark)
    return spark.read.schema(schema).json(path)


def read_orc(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    """ORC (Hive's native columnar format) with declared schema."""
    configure(spark)
    return spark.read.schema(schema).orc(path)


def read_csv_tolerant(
    spark: SparkSession,
    path: str,
    schema: StructType,
    mode: str = "PERMISSIVE",
    corrupt_col: str = "_corrupt_record",
    header: bool = True,
) -> DataFrame:
    """CSV ingest with explicit malformed-row policy (the Hive SerDe
    error-tolerance surface: real landing zones always contain breakage).

    mode='PERMISSIVE' (default): bad rows null out and the raw line lands
    in ``corrupt_col`` for a quarantine query to route; 'DROPMALFORMED'
    silently skips them; 'FAILFAST' raises on first breakage (the
    ingest-gate setting). The corrupt column must be part of the declared
    schema in PERMISSIVE mode -- this helper appends it."""
    from pyspark.sql.types import StringType, StructField

    configure(spark)
    read_schema = schema
    if mode.upper() == "PERMISSIVE" and corrupt_col not in schema.names:
        read_schema = StructType(
            [*schema.fields, StructField(corrupt_col, StringType())]
        )
    return (
        spark.read.schema(read_schema)
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )
