"""Round-9 text/ML batch: WordPiece training, benchmark
decontamination, depth-2 gradient-boosted stumps.

- text_wordpiece_train: the third mainstream tokenizer-training family
  next to BPE (pipeline36) and unigram-LM (pipeline53) -- likelihood-
  scored pair merges with ``##`` continuation pieces. Rows-only (an
  iterative argmax loop); tests/test_wordpiece.py replays the identical
  algorithm in pure Python and pins every row, plus partitioning
  invariance and the greedy longest-match scorer.
- dedup_decontaminate: the benchmark-decontamination report every
  LLM-data pipeline runs before training -- 13-gram collision rate of
  each training document against a holdout set, with the holdout
  injected deterministically in-query (the text_pii_redact recipe) so
  the DuckDB oracle can replay it exactly.
- ml_train_gbt2: depth-2 boosted stumps -- the round-8 histogram
  split-search machinery applied one level deeper (root split, then
  conditional child splits), still bins-not-rows bounded and
  oracle-checked via an unrolled CTE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


def _word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where((F.col("word") != "") & F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )


@declare("text_wordpiece_train", oracle=None)  # rows-only: argmax loop
def text_wordpiece_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece TRAINING on Spark (operators/tokenize.py
    wordpiece_train): words split into character symbols with the ``##``
    continuation prefix; per round one pair-count groupBy, one
    symbol-count groupBy, a Spark-side ranking by the LIKELIHOOD score
    pair_n/(n_a*n_b) (what distinguishes WordPiece from raw-count BPE),
    an exact integer re-rank of the collected top-8 window, and ONE JVM
    aggregate() fold applying the winner. Deterministic end to end;
    the driver sees 8 rows per round, never corpus bytes. Rows-only:
    the loop is not SQL-expressible; tests/test_wordpiece.py replays
    the identical algorithm in pure Python over the same word counts
    and pins every (step, pair, merged, counts) row."""
    from ..operators.tokenize import wordpiece_train

    merges = wordpiece_train(_word_counts(spark, sf_dir), n_merges=10)
    return spark.createDataFrame(
        [
            (int(s), a, b, m, int(np_), int(na), int(nb))
            for s, a, b, m, np_, na, nb in merges
        ],
        "step INT, sym_a STRING, sym_b STRING, merged STRING,"
        " pair_n BIGINT, n_a BIGINT, n_b BIGINT",
    )


@declare(
    "dedup_decontaminate",
    oracle="""
    WITH train_docs AS (
      SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 7
      UNION ALL
      SELECT -(doc_id) - 1000 AS doc_id, text FROM documents
      WHERE doc_id % 10 = 7 AND doc_id % 100 = 17
    ),
    tr AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 12),
               i -> array_to_string((string_split(text, ' '))[i:i+12], ' ')
             )) AS g
      FROM train_docs WHERE len(string_split(text, ' ')) >= 13),
    ho AS (
      SELECT DISTINCT
             unnest(list_transform(
               generate_series(1, len(string_split(text, ' ')) - 12),
               i -> array_to_string((string_split(text, ' '))[i:i+12], ' ')
             )) AS g
      FROM documents
      WHERE doc_id % 10 = 7 AND len(string_split(text, ' ')) >= 13),
    n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM tr GROUP BY doc_id),
    h AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS hits
          FROM tr WHERE g IN (SELECT g FROM ho) GROUP BY doc_id)
    SELECT n.doc_id, n.n_grams, h.hits,
           ROUND(CAST(h.hits AS DOUBLE) / n.n_grams, 6) AS rate
    FROM n JOIN h USING (doc_id)
    UNION ALL
    SELECT CAST(-1 AS BIGINT),
           (SELECT CAST(SUM(n_grams) AS BIGINT) FROM n),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM h),
           ROUND(CAST((SELECT COUNT(*) FROM h) AS DOUBLE)
                 / (SELECT COUNT(*) FROM n), 6)
    ORDER BY doc_id
    """,
)
def dedup_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-DECONTAMINATION report (the standard pre-training step
    the containment/substring primitives exist to serve): every TRAIN
    document's distinct 13-gram collisions against the HOLDOUT set --
    per contaminated doc (n_grams, hits, rate) plus one corpus summary
    row (doc_id = -1: total train grams, contaminated-doc count,
    contaminated share of gram-bearing train docs).

    The split is deterministic in-query (holdout = doc_id % 10 = 7),
    and -- the text_pii_redact injection recipe -- a known-contaminated
    twin of every %100=17 holdout doc is ADDED to the train side under
    a negative id, so the report provably fires at every SF and the
    oracle replays the injection exactly.

    Scale shape: candidate grams meet through one shingle equi-join
    (semi-join against the holdout gram set -- shuffle bounded by gram
    cardinality, never a cross join); per-doc rates are one groupBy.
    At 100 TB the holdout side is benchmark-sized (MBs), so the
    semi-join broadcasts."""
    from ..operators.dedup import doc_shingles

    d = load_table(spark, sf_dir, "documents")
    did = F.col("doc_id")
    twins = d.where((did % 10 == 7) & (did % 100 == 17)).select(
        (-did - 1000).alias("doc_id"), "text"
    )
    train = d.where(did % 10 != 7).select("doc_id", "text").unionByName(twins)
    hold = d.where(did % 10 == 7).select("doc_id", "text")

    # two consumers (per-doc gram counts + the holdout semi-join): persist
    # so the train side shingles once, not twice (bounded slot, guide §5)
    from ..operators.caching import persist_bounded

    tr = persist_bounded("decontaminate_tr", doc_shingles(train, n=13))
    ho = doc_shingles(hold, n=13).select("shingle").distinct()
    n = tr.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hits = (
        tr.join(ho, "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("hits"))
    )
    per_doc = (
        n.join(hits, "doc_id")
        .select(
            "doc_id",
            "n_grams",
            "hits",
            F.round(
                F.col("hits").cast("double") / F.col("n_grams"), 6
            ).alias("rate"),
        )
    )
    joined = n.join(hits, "doc_id", "left")
    summary = joined.agg(
        F.sum("n_grams").cast("long").alias("n_grams"),
        F.count("hits").cast("long").alias("hits"),
        F.round(F.count("hits") / F.count(F.lit(1)), 6).alias("rate"),
    ).select(F.lit(-1).cast("long").alias("doc_id"), "n_grams", "hits", "rate")
    return per_doc.unionByName(summary).orderBy("doc_id")


# ---------------------------------------------------------------------------
# depth-2 gradient-boosted trees (pipeline55's histogram machinery, one
# level deeper)
# ---------------------------------------------------------------------------

GBT2_ROUNDS = 2

_GBT2_BASE = """
base AS MATERIALIZED (
  SELECT CAST(l_quantity AS BIGINT) AS q,
         CAST(FLOOR(l_discount * 100 + 0.5) AS BIGINT) AS d,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) * 10000 AS y
  FROM lineitem),
m0 AS (SELECT CAST(FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*)) AS BIGINT) AS mu0
       FROM base),
t1 AS MATERIALIZED (SELECT q, d, y - (SELECT mu0 FROM m0) AS res FROM base)
"""


def _gbt2_round_sql(r: int) -> str:
    """CTEs for depth-2 boosting round r: root histogram -> root split
    -> per-side histograms -> per-side child splits -> residual update
    by the four leaf means.  All sums BIGINT-exact; scores are doubles
    of exact integers (deterministic IEEE), exactly pipeline55's
    discipline one level deeper."""
    return f"""h{r} AS MATERIALIZED (
  SELECT 'd' AS f, d AS x, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(res) AS BIGINT) AS s FROM t{r} GROUP BY d
  UNION ALL
  SELECT 'q' AS f, q AS x, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(res) AS BIGINT) AS s FROM t{r} GROUP BY q),
c{r} AS (
  SELECT f, x AS thr,
         CAST(SUM(n) OVER (PARTITION BY f ORDER BY x) AS BIGINT) AS nl,
         CAST(SUM(s) OVER (PARTITION BY f ORDER BY x) AS BIGINT) AS sl,
         CAST(SUM(n) OVER (PARTITION BY f) AS BIGINT) AS nt,
         CAST(SUM(s) OVER (PARTITION BY f) AS BIGINT) AS st
  FROM h{r}),
b{r} AS MATERIALIZED (
  SELECT f, thr,
         CAST(FLOOR(CAST(sl AS DOUBLE) / nl) AS BIGINT) AS mul,
         CAST(FLOOR(CAST(st - sl AS DOUBLE) / (nt - nl)) AS BIGINT) AS mur,
         ROUND((CAST(sl AS DOUBLE) * sl / nl
              + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl)) / 1e12,
               4) AS gain
  FROM c{r} WHERE nl < nt
  ORDER BY gain DESC, f, thr LIMIT 1),
s{r} AS MATERIALIZED (
  SELECT t.q, t.d, t.res,
         CASE WHEN (b.f = 'q' AND t.q <= b.thr)
               OR (b.f = 'd' AND t.d <= b.thr)
              THEN 'L' ELSE 'R' END AS side
  FROM t{r} t CROSS JOIN b{r} b),
hh{r} AS MATERIALIZED (
  SELECT side, 'd' AS f, d AS x, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(res) AS BIGINT) AS s FROM s{r} GROUP BY side, d
  UNION ALL
  SELECT side, 'q' AS f, q AS x, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(res) AS BIGINT) AS s FROM s{r} GROUP BY side, q),
cc{r} AS (
  SELECT side, f, x AS thr,
         CAST(SUM(n) OVER (PARTITION BY side, f ORDER BY x) AS BIGINT) AS nl,
         CAST(SUM(s) OVER (PARTITION BY side, f ORDER BY x) AS BIGINT) AS sl,
         CAST(SUM(n) OVER (PARTITION BY side, f) AS BIGINT) AS nt,
         CAST(SUM(s) OVER (PARTITION BY side, f) AS BIGINT) AS st
  FROM hh{r}),
bb{r} AS MATERIALIZED (
  SELECT side, f, thr, mul, mur, gain FROM (
    SELECT side, f, thr,
           CAST(FLOOR(CAST(sl AS DOUBLE) / nl) AS BIGINT) AS mul,
           CAST(FLOOR(CAST(st - sl AS DOUBLE) / (nt - nl)) AS BIGINT) AS mur,
           ROUND((CAST(sl AS DOUBLE) * sl / nl
                + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl)) / 1e12,
                 4) AS gain,
           row_number() OVER (
             PARTITION BY side
             ORDER BY ROUND((CAST(sl AS DOUBLE) * sl / nl
                  + CAST(st - sl AS DOUBLE) * (st - sl) / (nt - nl)) / 1e12,
                  4) DESC, f, thr) AS rn
    FROM cc{r} WHERE nl < nt) WHERE rn = 1),
t{r + 1} AS MATERIALIZED (
  SELECT s.q, s.d,
         s.res - CASE WHEN (bb.f = 'q' AND s.q <= bb.thr)
                       OR (bb.f = 'd' AND s.d <= bb.thr)
                      THEN bb.mul ELSE bb.mur END AS res
  FROM s{r} s JOIN bb{r} bb ON bb.side = s.side)"""


def _gbt2_oracle(rounds: int) -> str:
    ctes = [_GBT2_BASE.strip()]
    ctes.extend(_gbt2_round_sql(r) for r in range(1, rounds + 1))
    rows = []
    for r in range(1, rounds + 1):
        rmse = f"""(SELECT ROUND(SQRT(CAST(SUM(CAST(res AS DECIMAL(19,0))
                                 * CAST(res AS DECIMAL(19,0))) AS DOUBLE)
                          / COUNT(*)) / 1e6, 4) FROM t{r + 1})"""
        rows.append(
            f"""SELECT CAST({r} AS BIGINT) AS round, 'root' AS node, b.f AS feature,
       b.thr AS threshold, b.mul AS mu_left, b.mur AS mu_right,
       b.gain, {rmse} AS rmse
FROM b{r} b"""
        )
        rows.append(
            f"""SELECT CAST({r} AS BIGINT), CASE WHEN bb.side = 'L' THEN 'left' ELSE 'right' END,
       bb.f, bb.thr, bb.mul, bb.mur, bb.gain, {rmse}
FROM bb{r} bb"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows) \
        + "\nORDER BY round, node"


@declare("ml_train_gbt2", oracle=_gbt2_oracle(GBT2_ROUNDS))
def ml_train_gbt2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEPTH-2 gradient-boosted trees, oracle-checked end to end:
    pipeline55's exact-integer histogram split search applied one level
    deeper -- per round, the root split is found from per-feature
    residual histograms (50 + 11 cells), rows partition into the two
    sides, each side runs its OWN conditional histogram search (<= 122
    cells total), and the residual update subtracts the matching of the
    FOUR leaf means.  Output = three rows per round (root/left/right
    node, feature, threshold, leaf means, gain) sharing the round's
    post-update rmse -- the depth-2 boosting curve is the hash-checked
    result.  At 100 TB the split search still moves only #bins
    accumulators per level (the leaf-wise histogram trick: depth
    multiplies histogram passes, never row passes); the update is a
    map-side CASE against a 2-row broadcast relation."""
    import math

    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        F.col("l_quantity").cast("long").alias("q"),
        F.floor(F.col("l_discount") * 100 + 0.5).cast("long").alias("d"),
        (
            F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
            * 10000
        ).alias("y"),
    )
    tot = base.agg(F.sum("y").alias("sy"), F.count("*").alias("n")).collect()[0]
    mu0 = math.floor(float(int(tot["sy"])) / int(tot["n"]))
    t = base.select("q", "d", (F.col("y") - F.lit(mu0)).alias("res")).cache()

    def _scored(hist, part_cols):
        # totals partition by (.., f): each feature's histogram covers
        # its partition's rows exactly once
        w_cum = Window.partitionBy(*part_cols, "f").orderBy("x")
        w_all = Window.partitionBy(*part_cols, "f")
        c = hist.select(
            *part_cols,
            "f",
            F.col("x").alias("thr"),
            F.sum("n").over(w_cum).alias("nl"),
            F.sum("s").over(w_cum).alias("sl"),
            F.sum("n").over(w_all).alias("nt"),
            F.sum("s").over(w_all).alias("st"),
        ).where(F.col("nl") < F.col("nt"))
        sl_d = F.col("sl").cast("double")
        sr_d = (F.col("st") - F.col("sl")).cast("double")
        nr = F.col("nt") - F.col("nl")
        return c.select(
            *part_cols,
            "f",
            "thr",
            F.floor(sl_d / F.col("nl")).cast("long").alias("mul"),
            F.floor(sr_d / nr).cast("long").alias("mur"),
            F.round(
                (sl_d * F.col("sl") / F.col("nl")
                 + sr_d * (F.col("st") - F.col("sl")) / nr) / 1e12,
                4,
            ).alias("gain"),
        )

    def _hists(frame, part_cols):
        # Both feature histograms in ONE pass (GROUPING SETS: a single
        # Expand + aggregate, one exchange of <= 122 cells) instead of a
        # union of two groupBys scanning the cached residual relation
        # twice. gid bit layout over (parts..., d, q): the (d) set leaves
        # q un-grouped -> gid == 1; exact BIGINT sums, so the regrouping
        # cannot move a value.
        parts = [F.col(c) for c in part_cols]
        return (
            frame.groupingSets(
                [[*parts, F.col("d")], [*parts, F.col("q")]],
                *parts,
                F.col("d"),
                F.col("q"),
            )
            .agg(
                F.count("*").alias("n"),
                F.sum("res").alias("s"),
                F.grouping_id().alias("gid"),
            )
            .select(
                *parts,
                F.when(F.col("gid") == 1, F.lit("d"))
                .otherwise(F.lit("q"))
                .alias("f"),
                F.when(F.col("gid") == 1, F.col("d"))
                .otherwise(F.col("q"))
                .alias("x"),
                "n",
                "s",
            )
        )

    out: list[tuple] = []
    rdec = F.col("res").cast("decimal(19,0)")
    rmse_expr = F.round(
        F.sqrt(F.sum(rdec * rdec).cast("double") / F.count("*")) / 1e6, 4
    ).alias("rmse")
    # Round r's rmse aggregates t_{r+1} -- the same relation round r+1's
    # root split search reads. Deferring it into that action (a 1-row
    # crossJoin) drops one driver action per round; only the last round
    # pays a dedicated rmse job. Because t_{r+1} now first materializes
    # during round r+1's root action, s_r must stay cached until then.
    pending_rows: list[tuple] = []  # round r-1 output rows awaiting rmse
    prev_s = None
    for r in range(1, GBT2_ROUNDS + 1):
        root_q = (
            _scored(_hists(t, []), [])
            .orderBy(F.col("gain").desc(), "f", "thr")
            .limit(1)
        )
        if pending_rows:
            root = root_q.crossJoin(t.agg(rmse_expr)).collect()[0]
            rmse = float(root["rmse"])
            out.extend((*row, rmse) for row in pending_rows)
            pending_rows = []
        else:
            root = root_q.collect()[0]
        if prev_s is not None:
            prev_s.unpersist()
            prev_s = None
        rf, rthr = root["f"], int(root["thr"])
        side = F.when(F.col(rf) <= F.lit(rthr), F.lit("L")).otherwise(
            F.lit("R")
        )
        s = t.select("q", "d", "res", side.alias("side")).cache()
        ranked = _scored(_hists(s, ["side"]), ["side"])
        w_rn = Window.partitionBy("side").orderBy(
            F.col("gain").desc(), "f", "thr"
        )
        best2 = (
            ranked.withColumn("rn", F.row_number().over(w_rn))
            .where(F.col("rn") == 1)
            .collect()
        )  # bounded driver read: exactly two rows (one per side)
        by_side = {row["side"]: row for row in best2}
        if set(by_side) != {"L", "R"}:
            raise RuntimeError(
                f"gbt2 round {r}: side without a valid split ({set(by_side)})"
            )
        upd = F.col("res")
        for sd, row in sorted(by_side.items()):
            hit = (F.col("side") == sd) & (
                F.col(row["f"]) <= F.lit(int(row["thr"]))
            )
            miss = (F.col("side") == sd) & ~(
                F.col(row["f"]) <= F.lit(int(row["thr"]))
            )
            upd = F.when(hit, F.col("res") - F.lit(int(row["mul"]))).otherwise(
                F.when(miss, F.col("res") - F.lit(int(row["mur"]))).otherwise(upd)
            )
        t_new = s.select("q", "d", upd.alias("res")).cache()
        pending_rows.append(
            (r, "root", rf, rthr, int(root["mul"]), int(root["mur"]),
             float(root["gain"]))
        )
        for sd in ("L", "R"):
            row = by_side[sd]
            pending_rows.append(
                (r, "left" if sd == "L" else "right", row["f"],
                 int(row["thr"]), int(row["mul"]), int(row["mur"]),
                 float(row["gain"]))
            )
        t.unpersist()  # t_new derives from s (materialized by the best2
        prev_s = s     # collect), so t_r is no longer needed
        t = t_new
    rmse = float(t.agg(rmse_expr).collect()[0]["rmse"])
    out.extend((*row, rmse) for row in pending_rows)
    if prev_s is not None:
        prev_s.unpersist()
    t.unpersist()
    return spark.createDataFrame(
        out,
        "round BIGINT, node STRING, feature STRING, threshold BIGINT,"
        " mu_left BIGINT, mu_right BIGINT, gain DOUBLE, rmse DOUBLE",
    ).orderBy("round", "node")
