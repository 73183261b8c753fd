"""§2.K -- user-defined function surface: vectorized scalar pandas UDF,
grouped-aggregate pandas UDF, applyInPandas (UDAF via grouped map), and a
Python UDTF. All Python paths are Arrow-batched -- never row-at-a-time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StringType

from ..sources import load_table
from .registry import declare


@F.pandas_udf(StringType())
def _normalize_text(s: pd.Series) -> pd.Series:
    """Vectorized text normalization: collapse whitespace runs, trim, lower."""
    return s.str.replace(r" +", " ", regex=True).str.strip().str.lower()


@declare(
    "udf_scalar",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS norm_md5,
           CAST(length(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS BIGINT)
             AS norm_len
    FROM documents
    """,
)
def udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas UDF (Arrow-vectorized; the Hive GenericUDF analog):
    normalize text in Python, hash JVM-side. Oracle recomputes the
    normalization in SQL -- the check proves UDF/SQL equivalence."""
    d = load_table(spark, sf_dir, "documents")
    norm = _normalize_text(F.col("text"))
    return d.select(
        "doc_id",
        F.md5(norm).alias("norm_md5"),
        F.length(norm).cast("long").alias("norm_len"),
    )


@F.pandas_udf(DoubleType())
def _geo_mean(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: geometric mean."""
    return float(np.exp(np.log(v.to_numpy(dtype=np.float64)).mean()))


@F.pandas_udf(LongType())
def _count_rows(v: pd.Series) -> int:
    """Grouped-agg pandas UDF: row count (grouped-agg pandas UDFs cannot mix
    with JVM aggregates in one agg clause, so count is a pandas UDF too)."""
    return len(v)


@declare(
    "udaf_grouped",
    oracle="""
    SELECT lang, ROUND(exp(avg(ln(CAST(n_chars AS DOUBLE)))), 6) AS geo_chars,
           COUNT(*) AS n
    FROM documents GROUP BY lang
    """,
)
def udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (Hive GenericUDAFResolver analog):
    geometric mean of document lengths per language."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.round(_geo_mean(F.col("n_chars").cast("double")), 6).alias("geo_chars"),
        _count_rows(F.col("n_chars")).alias("n"),
    )


@declare(
    "udaf_apply_in_pandas",
    oracle="""
    SELECT lang,
           ROUND(quantile_cont(CAST(n_chars AS DOUBLE), 0.5), 4) AS median_chars,
           COUNT(*) AS n
    FROM documents GROUP BY lang
    """,
)
def udaf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map UDAF: per-language median via pandas
    (linear interpolation == quantile_cont). Arrow-batched; each group is
    one pandas frame on one executor."""
    d = load_table(spark, sf_dir, "documents")

    def median_frame(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "median_chars": [round(float(pdf["n_chars"].median()), 4)],
                "n": [np.int64(len(pdf))],
            }
        )

    return d.select("lang", "n_chars").groupBy("lang").applyInPandas(
        median_frame, schema="lang string, median_chars double, n long"
    )
