"""Analytic batch 5: gaps-and-islands streaks, winsorized robust means,
exponential time-decay scoring, and a recursive EWMA as a higher-order
array fold. All four oracle-checked.

Shared hazards handled here:
- events.ts carries microsecond payloads: second-granularity casts truncate
  differently across engines, so all time arithmetic uses exact epoch
  MICROSECONDS (Spark unix_micros <-> DuckDB epoch_us) and converts to
  double days only for the final exp().
- exp() may differ by 1 ulp between libm and the JVM: every transcendental
  output is rounded (registry convention), and sums of exp terms round to 4.
- DuckDB turns bare decimal literals into DECIMAL: the EWMA lambda casts its
  coefficients to DOUBLE so both engines fold in pure double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

# epoch_us(2024-02-01 00:00:00 UTC) -- the decay anchor, just past the
# events fixture's 2024-01 span.
_ANCHOR_US = 1_706_745_600_000_000
_US_PER_DAY = 86_400_000_000.0


@declare(
    "events_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    grp AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS anchor
      FROM days),
    streaks AS (
      SELECT user_id, COUNT(*) AS len
      FROM grp GROUP BY user_id, anchor)
    SELECT user_id, SUM(len) AS n_active_days,
           COUNT(*) AS n_streaks, MAX(len) AS longest_streak
    FROM streaks GROUP BY user_id
    """,
)
def events_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-active-day streaks per user (the
    retention/engagement metric). The classic trick -- date minus dense row
    number is constant within a run of consecutive dates -- turns streak
    detection into two group-bys, no self-join, no iteration. Both shuffles
    key on user_id, so at scale this is one repartition reused; the distinct
    collapses the raw event stream ~30x before any window runs."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    grp = days.withColumn("anchor", F.date_sub(F.col("d"), F.row_number().over(w)))
    streaks = grp.groupBy("user_id", "anchor").agg(F.count("*").alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.count("*").alias("n_streaks"),
        F.max("len").alias("longest_streak"),
    )


@declare(
    "agg_winsorize",
    oracle="""
    WITH bounds AS (
      SELECT c_mktsegment AS seg,
             quantile_cont(c_acctbal, 0.05) AS lo,
             quantile_cont(c_acctbal, 0.95) AS hi
      FROM customer GROUP BY c_mktsegment)
    SELECT c_mktsegment, COUNT(*) AS n,
           ROUND(AVG(c_acctbal), 4) AS raw_mean,
           ROUND(AVG(GREATEST(lo, LEAST(hi, c_acctbal))), 4) AS wins_mean
    FROM customer JOIN bounds ON c_mktsegment = seg
    GROUP BY c_mktsegment
    """,
)
def agg_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per market segment: clamp each balance into its
    segment's [p5, p95] band before averaging -- the robust-statistics move
    that tames heavy tails without dropping rows. Two grouped passes over
    the same key: the exact-percentile aggregate (5 rows) broadcasts back
    onto the detail, then the clamped re-aggregation partial-aggregates
    map-side. At 100 TB swap percentile for percentile_approx and the
    second pass is unchanged."""
    c = load_table(spark, sf_dir, "customer")
    bounds = c.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        F.percentile("c_acctbal", 0.05).alias("lo"),
        F.percentile("c_acctbal", 0.95).alias("hi"),
    )
    clamped = F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("c_acctbal")))
    return (
        c.join(F.broadcast(bounds), F.col("c_mktsegment") == F.col("seg"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("c_acctbal"), 4).alias("raw_mean"),
            F.round(F.avg(clamped), 4).alias("wins_mean"),
        )
    )


@declare(
    "events_decay",
    oracle=f"""
    SELECT user_id,
           ROUND(SUM(value * exp(-(CAST({_ANCHOR_US} - epoch_us(ts) AS DOUBLE)
                                   / {_US_PER_DAY}) / 7.0)), 4) AS decayed_score,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def events_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay engagement score: each event contributes
    value * exp(-age_days / 7) at the anchor instant -- recency-weighted
    activity, the batch form of what a streaming job keeps as one running
    number per user (decay state folds multiplicatively, so the streaming
    variant never replays history). Ages are exact epoch-microsecond longs
    before the single double division; one grouped pass, map-side partials.
    """
    ev = load_table(spark, sf_dir, "events")
    age_days = (_ANCHOR_US - F.unix_micros("ts")).cast("double") / _US_PER_DAY
    return ev.groupBy("user_id").agg(
        F.round(F.sum(F.col("value") * F.exp(-age_days / 7.0)), 4).alias(
            "decayed_score"
        ),
        F.count("*").alias("n_events"),
    )


@declare(
    "win_ewma",
    oracle="""
    SELECT event_id, user_id,
           FLOOR(list_reduce(vals,
                 (acc, x) -> CAST(0.3 AS DOUBLE) * x
                             + CAST(0.7 AS DOUBLE) * acc) * 1000000 + 0.5)
               / 1000000.0 AS ewma8
    FROM (
      SELECT event_id, user_id,
             list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                 AS vals
      FROM events)
    """,
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive EWMA (alpha=0.3) over each user's last 8 events: the
    exponential smoother every monitoring stack runs, which plain window
    aggregates cannot express (each output depends on the previous output).
    Solution: collect the bounded frame into an array, then fold it with a
    higher-order aggregate -- e_i = 0.3 x_i + 0.7 e_{i-1}, seeded with the
    frame's first value (list_reduce semantics, mirrored exactly by seeding
    Spark's aggregate() with element_at(vals, 1)). All JVM expression work:
    the frame is bounded (8 values) so the array never exceeds 8 doubles
    regardless of stream length -- constant state per row at any scale.
    Output rounds via FLOOR(x*1e6 + 0.5) -- half-up on the bit-identical
    IEEE value in both engines; plain ROUND(...,6) flaked on ~1e-4 of rows
    landing on a half-digit boundary (observed at sf0.01)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, Window.currentRow)
    )
    vals = F.collect_list("value").over(w)
    ewma = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return ev.select(
        "event_id",
        "user_id",
        (F.floor(ewma * 1_000_000 + 0.5) / 1_000_000.0).alias("ewma8"),
    )


@declare(
    "agg_equidepth_hist",
    oracle="""
    SELECT o_orderpriority, tile, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM (
      SELECT o_orderpriority, o_totalprice,
             CAST(ntile(8) OVER (PARTITION BY o_orderpriority
                                 ORDER BY o_totalprice, o_orderkey)
                  AS BIGINT) AS tile
      FROM orders)
    GROUP BY o_orderpriority, tile
    """,
)
def agg_equidepth_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram per order priority: exact ntile(8) splits each
    group into equal-count bands, then min/max per band gives the
    boundaries -- the quantile-sketch view of a distribution as a query
    (CBO histograms and data-skipping zone maps are this shape). Only ~5
    priorities exist, so a plain partitioned window would funnel N/5 fact
    rows through single tasks at scale; the grouped two-phase rank
    (operators/global_rank.py) range-partitions (group, value) instead --
    every task holds one shuffle partition, groups restart via the tiny
    per-(partition, group) offsets. Ties break on o_orderkey; boundary
    values are untouched fixture doubles, so no rounding discipline is
    needed."""
    from ..operators.global_rank import with_grouped_ntile

    o = load_table(spark, sf_dir, "orders")
    tiled = with_grouped_ntile(
        o.select("o_orderpriority", "o_totalprice", "o_orderkey"),
        ["o_orderpriority"],
        [F.col("o_totalprice"), F.col("o_orderkey")],
        8,
        "tile",
    )
    return tiled.groupBy("o_orderpriority", "tile").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@declare(
    "events_cumulative_users",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY user_id),
    new_per_day AS (
      SELECT d, COUNT(*) AS new_users FROM first_day GROUP BY d)
    SELECT strftime(d, '%Y-%m-%d') AS day, new_users,
           SUM(new_users) OVER (ORDER BY d
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cum_users
    FROM new_per_day
    """,
)
def events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users by day -- the growth curve. Running
    COUNT(DISTINCT) over an expanding window is quadratic done naively;
    the standard reduction is first-touch attribution: min(date) per user
    (one user-keyed aggregate), count news per day, prefix-sum. The only
    unpartitioned window runs over ~#days rows (the grouped result), never
    the event stream. Day is emitted as a string (registry rule: no DATE
    output columns)."""
    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("d"))
    per_day = first_day.groupBy("d").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        F.date_format("d", "yyyy-MM-dd").alias("day"),
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@declare(
    "events_rolling_wau",
    oracle="""
    WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    spine AS (SELECT DISTINCT d FROM days)
    SELECT strftime(s.d, '%Y-%m-%d') AS day,
           COUNT(DISTINCT a.user_id) AS wau
    FROM spine s JOIN days a ON a.d BETWEEN s.d - 6 AND s.d
    GROUP BY s.d
    """,
)
def events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users per day (WAU). Distinct-over-sliding-
    window is not a frame-expressible aggregate (distinct state cannot
    merge by subtraction), so the plan is the day-spine range join: distinct
    (user, day) once -- the event stream collapses ~30x before anything
    else -- then each spine day joins its trailing week and counts distinct
    users. The join fans out at most 7x the compacted day relation,
    independent of raw event volume; the spine is tiny and broadcasts."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    spine = days.select(F.col("d").alias("sd")).distinct()
    return (
        days.join(
            F.broadcast(spine),
            (F.col("d") >= F.date_sub(F.col("sd"), 6)) & (F.col("d") <= F.col("sd")),
        )
        .groupBy("sd")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.date_format("sd", "yyyy-MM-dd").alias("day"), "wau")
    )


@declare(
    "events_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type),
    mad AS (
      SELECT e.event_type, med,
             quantile_cont(abs(value - med), 0.5) AS mad
      FROM events e JOIN med USING (event_type)
      GROUP BY e.event_type, med)
    SELECT event_id, e.event_type, value,
           (abs(value - med) > 3 * 1.4826 * mad) AS is_outlier
    FROM events e JOIN mad USING (event_type)
    """,
)
def events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags: |value - median| > 3 * 1.4826 * MAD per event
    type -- the median-absolute-deviation detector that, unlike the 3-sigma
    flags (events_anomaly), is not itself dragged by the outliers it hunts.
    Two grouped percentile passes (median, then median of absolute
    deviations with the median broadcast back), then a broadcast of the
    tiny per-type stats onto the stream. At 100 TB both percentile passes
    swap to percentile_approx and the shape is unchanged. Exactness: both
    engines interpolate quantiles identically on identical doubles
    (agg_percentile precedent), and the flag's margin is huge relative to
    any ulp drift."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy(F.col("event_type").alias("met")).agg(
        F.percentile("value", 0.5).alias("med")
    )
    with_med = ev.join(F.broadcast(med), ev.event_type == F.col("met"))
    mad = with_med.groupBy(F.col("event_type").alias("mat")).agg(
        F.first("med").alias("med2"),
        F.percentile(F.abs(F.col("value") - F.col("med")), 0.5).alias("mad"),
    )
    return (
        ev.join(F.broadcast(mad), ev.event_type == F.col("mat"))
        .select(
            "event_id",
            "event_type",
            "value",
            (
                F.abs(F.col("value") - F.col("med2"))
                > 3 * 1.4826 * F.col("mad")
            ).alias("is_outlier"),
        )
    )


@declare(
    "fn_printf",
    oracle="""
    SELECT c_custkey,
           printf('C%08d', c_custkey) AS cust_code,
           printf('%x', c_nationkey) AS nation_hex,
           printf('%s=%.2f', c_mktsegment, c_acctbal) AS seg_bal
    FROM customer
    """,
)
def fn_printf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C-style string formatting (Spark format_string == Java formatter,
    DuckDB printf == fmt): zero-padded codes, hex rendering, mixed-type
    templates -- the report/export surface. %.2f is applied only to
    c_acctbal, an exact 2-decimal fixture value, so the rendered digits
    cannot depend on rounding-mode differences between the formatters."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.format_string("C%08d", "c_custkey").alias("cust_code"),
        F.format_string("%x", "c_nationkey").alias("nation_hex"),
        F.format_string("%s=%.2f", "c_mktsegment", "c_acctbal").alias("seg_bal"),
    )
