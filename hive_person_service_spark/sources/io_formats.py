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
