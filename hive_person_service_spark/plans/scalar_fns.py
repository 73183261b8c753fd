"""§2.H -- scalar function families: string, date/time, math, conditional,
array/explode (LATERAL VIEW), map, JSON, hash.

All expressions are built-in pyspark.sql.functions -- JVM-side, inside
whole-stage codegen; no Python in the data path. Transcendental outputs are
rounded to 6 decimals (JVM libm vs DuckDB libm may differ in the last ulp);
sqrt is IEEE-exact and left unrounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           CAST(length(p_name) AS BIGINT) AS name_len,
           upper(p_name) AS up_name,
           lower(p_brand) AS lo_brand,
           substr(p_name, 1, 5) AS first5,
           lpad(p_type, 12, '*') AS padded,
           concat_ws('-', p_brand, p_type) AS tag,
           regexp_extract(p_name, '^(\\w+)', 1) AS first_word,
           regexp_replace(p_name, ' ', '_') AS underscored,
           reverse(p_name) AS rev_name,
           trim('  ' || p_name || '  ') AS trimmed,
           CAST(levenshtein(p_name, 'cold widget') AS BIGINT) AS lev_dist
    FROM part
    """,
)
def fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family: length/case/substr/pad/concat/regexp/
    reverse/trim/levenshtein."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").cast("long").alias("name_len"),
        F.upper("p_name").alias("up_name"),
        F.lower("p_brand").alias("lo_brand"),
        F.substring("p_name", 1, 5).alias("first5"),
        F.lpad("p_type", 12, "*").alias("padded"),
        F.concat_ws("-", "p_brand", "p_type").alias("tag"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", " ", "_").alias("underscored"),
        F.reverse("p_name").alias("rev_name"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("trimmed"),
        F.levenshtein("p_name", F.lit("cold widget")).cast("long").alias("lev_dist"),
    )


@declare(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(month(o_orderdate) AS BIGINT) AS mo,
           CAST(day(o_orderdate) AS BIGINT) AS dy,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           date_trunc('month', o_orderdate) AS month_start,
           CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           epoch_us(o_orderdate) AS epoch_us
    FROM orders
    """,
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family: extract parts, truncate, day arithmetic, last_day,
    epoch micros."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).cast("long").alias("yr"),
        F.month(d).cast("long").alias("mo"),
        F.dayofmonth(d).cast("long").alias("dy"),
        F.quarter(d).cast("long").alias("qtr"),
        F.date_trunc("month", d).alias("month_start"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("long")
        .alias("days_since"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(d.cast("date"), 30), "yyyy-MM-dd").alias("plus30"),
        F.unix_micros(d).alias("epoch_us"),
    )


@declare(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           abs(l_discount - 0.05) AS abs_ctr,
           round(l_extendedprice, 1) AS price_r1,
           CAST(ceil(l_quantity) AS BIGINT) AS ceil_qty,
           CAST(floor(l_quantity) AS BIGINT) AS floor_qty,
           sqrt(l_extendedprice) AS sqrt_price,
           ROUND(pow(l_quantity, 2), 6) AS qty_sq,
           ROUND(exp(l_discount), 6) AS exp_disc,
           ROUND(ln(l_extendedprice), 6) AS ln_price,
           ROUND(log10(l_extendedprice), 6) AS log10_price,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS sign_ctr,
           l_orderkey % 7 AS mod7,
           greatest(l_tax, l_discount) AS max_rate,
           least(l_tax, l_discount) AS min_rate
    FROM lineitem
    """,
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: abs/round/ceil/floor/sqrt/pow/exp/ln/log10/sign/pmod/
    greatest/least."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_ctr"),
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.ceil("l_quantity").cast("long").alias("ceil_qty"),
        F.floor("l_quantity").cast("long").alias("floor_qty"),
        F.sqrt("l_extendedprice").alias("sqrt_price"),
        F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
        F.round(F.exp("l_discount"), 6).alias("exp_disc"),
        F.round(F.log("l_extendedprice"), 6).alias("ln_price"),
        F.round(F.log10("l_extendedprice"), 6).alias("log10_price"),
        F.signum(F.col("l_discount") - 0.05).cast("double").alias("sign_ctr"),
        F.pmod("l_orderkey", F.lit(7)).alias("mod7"),
        F.greatest("l_tax", "l_discount").alias("max_rate"),
        F.least("l_tax", "l_discount").alias("min_rate"),
    )


@declare(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING') AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'NONE') AS seg_filled,
           CASE WHEN c_acctbal < 0 THEN 'neg' ELSE 'nonneg' END AS bal_class,
           nullif(c_nationkey, 0) AS nation_or_null
    FROM customer
    """,
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null family: nullif, coalesce (nvl), CASE WHEN."""
    c = load_table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("NONE")).alias("seg_filled"),
        F.when(F.col("c_acctbal") < 0, "neg").otherwise("nonneg").alias("bal_class"),
        F.nullif(F.col("c_nationkey"), F.lit(0)).alias("nation_or_null"),
    )


@declare(
    "fn_array_explode",
    oracle="""
    SELECT doc_id,
           CAST(len(str_split(text, ' ')) AS BIGINT) AS n_tokens,
           list_contains(str_split(text, ' '), 'spark') AS has_spark,
           unnest(str_split(text, ' ')) AS token
    FROM documents
    WHERE doc_id < 200
    """,
)
def fn_array_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family + UDTF surface: split -> size/array_contains -> explode
    (Hive LATERAL VIEW explode)."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    tokens = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        F.array_contains(tokens, "spark").alias("has_spark"),
        F.explode(tokens).alias("token"),
    )


@declare(
    "fn_map",
    oracle="""
    SELECT event_id,
           event_type AS m_type,
           CAST(user_id AS VARCHAR) AS m_uid,
           'type,uid' AS keys_list,
           CAST(2 AS BIGINT) AS n_keys
    FROM events
    """,
)
def fn_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build a MAP column, extract values / keys / size. The
    oracle is the algebraic identity (map round-trip returns its inputs) --
    the check proves the Spark map operations preserve the data."""
    ev = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"), F.lit("uid"), F.col("user_id").cast("string")
    )
    return ev.select(
        "event_id",
        F.element_at(m, "type").alias("m_type"),
        F.element_at(m, "uid").alias("m_uid"),
        F.array_join(F.map_keys(m), ",").alias("keys_list"),
        F.size(m).cast("long").alias("n_keys"),
    )


@declare(
    "fn_json_props",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k2,
           '{"k":' || CAST(CAST(json_extract(props, '$.k') AS BIGINT) AS VARCHAR) || '}'
             AS rebuilt
    FROM events
    """,
)
def fn_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props: get_json_object, from_json (typed
    struct), to_json round-trip."""
    ev = load_table(spark, sf_dir, "events")
    k_str = F.get_json_object("props", "$.k")
    parsed = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        k_str.cast("long").alias("k"),
        (parsed["k"] * 2).alias("k2"),
        F.to_json(F.struct(parsed["k"].alias("k"))).alias("rebuilt"),
    )


@declare(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS text_md5,
           sha256(text) AS text_sha256,
           md5(lang || ':' || source) AS tag_md5
    FROM documents
    """,
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family (cross-engine-stable subset): md5 / sha2-256."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(F.concat_ws(":", "lang", "source")).alias("tag_md5"),
    )


@declare("fn_string_spark", oracle=None)  # rows-only: no DuckDB equivalents
def fn_string_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String functions with no (1.0-era) DuckDB counterpart: initcap,
    translate, instr, substring_index, repeat, soundex, format_number.
    Deterministic within Spark; pytest pins exact values on fixed inputs."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.initcap("p_name").alias("title_name"),
        F.translate("p_name", "aeiou", "AEIOU").alias("vowels_up"),
        F.instr("p_name", "o").cast("long").alias("first_o"),
        F.substring_index("p_name", " ", 1).alias("head_word"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
        F.soundex("p_brand").alias("brand_soundex"),
        F.format_number("p_retailprice", 2).alias("pretty_price"),
    )


@declare("fn_hash_spark", oracle=None)  # rows-only: Spark-specific hash fns
def fn_hash_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-specific hashes (xxhash64 / Murmur3 hash / crc32): deterministic
    within Spark, no DuckDB equivalent -> rows-only check; pytest pins exact
    values on fixed inputs."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("text_xxh64"),
        F.hash("text").cast("long").alias("text_murmur3"),
        F.crc32("text").alias("text_crc32"),
    )
