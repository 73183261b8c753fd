"""Property-based Spark-vs-DuckDB agreement (SURVEY.md §5.2.3): random
predicates and random strings must produce identical results through both
engines -- the generalized form of the per-query oracle checks."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
OPS = ["<", "<=", ">", ">=", "="]

_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@pytest.fixture(scope="module")
def li(spark):
    from hive_person_service_spark.sources import load_table

    df = load_table(spark, SF_SMALL, "lineitem").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def duck_li():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{SF_SMALL}/lineitem.parquet')"
    )
    return con


@given(
    col=st.sampled_from(NUM_COLS),
    op=st.sampled_from(OPS),
    frac=st.floats(0.0, 1.0),
    col2=st.sampled_from(NUM_COLS),
    op2=st.sampled_from(OPS),
    frac2=st.floats(0.0, 1.0),
    conj=st.booleans(),
)
@_settings
def test_random_predicates_agree(li, duck_li, col, op, frac, col2, op2, frac2, conj):
    domains = {
        "l_quantity": (1.0, 50.0),
        "l_extendedprice": (900.0, 105000.0),
        "l_discount": (0.0, 0.1),
        "l_tax": (0.0, 0.08),
    }
    lo, hi = domains[col]
    v = round(lo + frac * (hi - lo), 4)
    lo2, hi2 = domains[col2]
    v2 = round(lo2 + frac2 * (hi2 - lo2), 4)
    glue = "AND" if conj else "OR"
    sql_pred = f"{col} {op} {v} {glue} {col2} {op2} {v2}"
    spark_n = li.where(F.expr(sql_pred)).count()
    duck_n = duck_li.execute(
        f"SELECT count(*) FROM lineitem WHERE {sql_pred}"
    ).fetchone()[0]
    assert spark_n == duck_n, sql_pred


@given(
    gcol=st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey"]),
    acol=st.sampled_from(NUM_COLS),
    fcol=st.sampled_from(NUM_COLS),
    op=st.sampled_from(OPS),
    frac=st.floats(0.0, 1.0),
)
@_settings
def test_random_groupby_agg_agree(li, duck_li, gcol, acol, fcol, op, frac):
    domains = {
        "l_quantity": (1.0, 50.0),
        "l_extendedprice": (900.0, 105000.0),
        "l_discount": (0.0, 0.1),
        "l_tax": (0.0, 0.08),
    }
    lo, hi = domains[fcol]
    v = round(lo + frac * (hi - lo), 4)
    pred = f"{fcol} {op} {v}"
    got = {
        tuple(r)
        for r in li.where(F.expr(pred))
        .groupBy(gcol)
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(acol), 2).alias("s"),
            F.min(acol).alias("mn"),
            F.max(acol).alias("mx"),
        )
        .collect()
    }
    want = set(
        map(
            tuple,
            duck_li.execute(
                f"SELECT {gcol}, count(*), round(sum({acol}), 2), "
                f"min({acol}), max({acol}) FROM lineitem WHERE {pred} GROUP BY 1"
            ).fetchall(),
        )
    )
    assert got == want, pred


@given(
    pcol=st.sampled_from(["l_returnflag", "l_linestatus", "l_suppkey"]),
    ocol=st.sampled_from(NUM_COLS),
    desc=st.booleans(),
    k=st.integers(1, 5),
)
@_settings
def test_random_window_topk_agree(li, duck_li, pcol, ocol, desc, k):
    """Random top-k-per-group windows agree with DuckDB (unique tie-break
    on (l_orderkey, l_linenumber) keeps both engines deterministic)."""
    direction = "DESC" if desc else "ASC"
    sql = f"""
      SELECT {pcol}, l_orderkey, l_linenumber FROM (
        SELECT {pcol}, l_orderkey, l_linenumber,
               row_number() OVER (PARTITION BY {pcol}
                 ORDER BY {ocol} {direction}, l_orderkey, l_linenumber) AS rn
        FROM lineitem) WHERE rn <= {k}
    """
    from pyspark.sql import Window

    order = [F.col(ocol).desc() if desc else F.col(ocol).asc(),
             "l_orderkey", "l_linenumber"]
    w = Window.partitionBy(pcol).orderBy(*order)
    got = {
        tuple(r)
        for r in li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select(pcol, "l_orderkey", "l_linenumber")
        .collect()
    }
    want = set(map(tuple, duck_li.execute(sql).fetchall()))
    assert got == want


@given(st.lists(st.text(st.characters(codec="ascii"), max_size=40), max_size=30))
@_settings
def test_string_functions_agree(spark, texts):
    texts = [t for t in texts if "'" not in t and "\\" not in t and "\x00" not in t]
    if not texts:
        return
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {
        (r.s, r.m, r.n, r.u)
        for r in df.select(
            "s",
            F.md5("s").alias("m"),
            F.length("s").cast("long").alias("n"),
            F.upper("s").alias("u"),
        ).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"('{t}')" for t in texts)
    want = set(
        map(
            tuple,
            con.execute(
                f"SELECT s, md5(s), CAST(length(s) AS BIGINT), upper(s) "
                f"FROM (VALUES {vals}) t(s)"
            ).fetchall(),
        )
    )
    assert got == want
