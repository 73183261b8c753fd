"""Round-8 ML addition: ALS matrix factorization, oracle-checked.

``ml_train_als`` runs R alternating-least-squares rounds over the
implicit (customer, part, rating) relation derived from orders x
lineitem (rating = mean ordered quantity).  RANK-1 factors keep each
half-step a CLOSED-FORM scalar normal equation --

    p_u = sum_i(q_i * r_ui) / (lambda + sum_i(q_i^2))
    q_i = sum_u(p_u * r_ui) / (lambda + sum_u(p_u^2))

-- which makes the whole alternating fit a finite relational
expression both engines can evaluate exactly, so the DuckDB oracle is
the same R rounds unrolled into MATERIALIZED CTEs (the
``ml_kmeans_train`` recipe: iterative training certified cross-engine).
Every source of drift is pinned: deterministic init (q = 1.0), fixed
round count, ratings rounded to 2 decimals, factors QUANTIZED to 6
decimals per half-step so both engines solve over bit-identical
inputs, and the per-round curve (RMSE to 6, factor means to 4)
rounded the same way on both sides.

Scale shape per half-step: one shuffle on the solved-for key (user
then item) aggregating three partial sums -- the sufficient-statistics
bound (never a per-row Python step, never factors to the driver); the
ratings relation is cached once, each round's factor frame is cached
and the previous unpersisted (the k-core lineage discipline).  Only R
rows of curve scalars ever reach the driver.  Rank-F extension swaps
the scalar division for an FxF solve per key -- same shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare

ALS_ROUNDS = 3
ALS_LAMBDA = 0.1


def _als_oracle(rounds: int, lam: float) -> str:
    ctes = [
        """ratings AS MATERIALIZED (
      SELECT o_custkey AS u, l_partkey AS i,
             ROUND(AVG(l_quantity), 2) AS r
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2)""",
        "q0 AS MATERIALIZED (SELECT DISTINCT i, 1.0 AS q FROM ratings)",
    ]
    for n in range(1, rounds + 1):
        ctes.append(
            f"""p{n} AS MATERIALIZED (
      SELECT u, ROUND(SUM(q * r) / ({lam} + SUM(q * q)), 6) AS p
      FROM ratings JOIN q{n - 1} USING (i) GROUP BY u)"""
        )
        ctes.append(
            f"""q{n} AS MATERIALIZED (
      SELECT i, ROUND(SUM(p * r) / ({lam} + SUM(p * p)), 6) AS q
      FROM ratings JOIN p{n} USING (u) GROUP BY i)"""
        )
    stats = "\nUNION ALL\n".join(
        f"""SELECT CAST({n} AS BIGINT) AS round,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM p{n}) AS n_users,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM q{n}) AS n_items,
       (SELECT ROUND(AVG(p), 4) FROM p{n}) AS avg_p,
       (SELECT ROUND(AVG(q), 4) FROM q{n}) AS avg_q,
       ROUND(SQRT(AVG((r - p * q) * (r - p * q))), 6) AS rmse
FROM ratings JOIN p{n} USING (u) JOIN q{n} USING (i)"""
        for n in range(1, rounds + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + stats


@declare("ml_train_als", oracle=_als_oracle(ALS_ROUNDS, ALS_LAMBDA))
def ml_train_als(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALS matrix-factorization TRAINING (rank 1, lambda=0.1, 3
    alternating rounds) over the customer x part rating matrix, with
    the per-round RMSE curve hash-checked against a DuckDB replay of
    the identical quantized normal equations -- an iterative
    recommender fit certified cross-engine.  Output: (round, n_users,
    n_items, avg_p, avg_q, rmse)."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    ratings = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.round(F.avg("l_quantity"), 2).alias("r"))
        .cache()
    )
    q = ratings.select("i").distinct().withColumn("q", F.lit(1.0)).cache()

    out: list[tuple] = []
    for n in range(1, ALS_ROUNDS + 1):
        p = (
            ratings.join(q, "i")
            .groupBy("u")
            .agg(
                F.round(
                    F.sum(F.col("q") * F.col("r"))
                    / (F.lit(ALS_LAMBDA) + F.sum(F.col("q") * F.col("q"))),
                    6,
                ).alias("p")
            )
            .cache()
        )
        new_q = (
            ratings.join(p, "u")
            .groupBy("i")
            .agg(
                F.round(
                    F.sum(F.col("p") * F.col("r"))
                    / (F.lit(ALS_LAMBDA) + F.sum(F.col("p") * F.col("p"))),
                    6,
                ).alias("q")
            )
            .cache()
        )
        # bounded driver read: the round's 6 curve scalars in ONE action.
        # The three 1-row aggregates (user stats, item stats, rmse) used to
        # be three sequential collect()s -- three driver round-trips and
        # three separate job submissions per round; crossJoining the 1-row
        # relations executes all three subtrees in a single action (each
        # aggregate's plan, and therefore its arithmetic, is unchanged --
        # p/new_q stay cached and are materialized exactly once).
        pu = p.agg(
            F.count("*").alias("n_p"), F.round(F.avg("p"), 4).alias("m_p")
        )
        qi = new_q.agg(
            F.count("*").alias("n_q"), F.round(F.avg("q"), 4).alias("m_q")
        )
        err = F.col("r") - F.col("p") * F.col("q")
        rm = (
            ratings.join(p, "u")
            .join(new_q, "i")
            .agg(F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"))
        )
        row = pu.crossJoin(qi).crossJoin(rm).collect()[0]
        out.append(
            (n, int(row["n_p"]), int(row["n_q"]), float(row["m_p"]),
             float(row["m_q"]), float(row["rmse"]))
        )
        q.unpersist()
        q = new_q
        p.unpersist()
    q.unpersist()
    ratings.unpersist()
    return spark.createDataFrame(
        out,
        "round bigint, n_users bigint, n_items bigint, "
        "avg_p double, avg_q double, rmse double",
    )


# ---------------------------------------------------------------------------
# unigram-LM (SentencePiece-style) tokenizer training
# ---------------------------------------------------------------------------


@declare("text_unigram_train", oracle=None)  # rows-only: EM loop
def text_unigram_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenizer TRAINING (operators/tokenize.py
    unigram_train) -- the OTHER mainstream tokenizer family next to
    text_bpe_train: seed vocab from substring counts (one explode +
    groupBy over the Zipf-bounded word relation), 3 EM rounds whose
    E-step Viterbi-segments every distinct word executor-side (in-row
    DP via one Arrow-batched mapInPandas per round) and whose M-step is
    an exact integer re-count, then deterministic pruning to the final
    vocab.  Rows-only: the EM loop is not SQL-expressible;
    tests/test_unigram.py replays the identical orchestration in pure
    Python over the same word counts and pins every
    (rank, piece, count, logp) row."""
    from ..operators.tokenize import unigram_train

    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where((F.col("word") != "") & F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    vocab = unigram_train(words, n_rounds=3, max_len=4, seed_size=50,
                          vocab_size=40)
    return spark.createDataFrame(
        [(int(r), p, int(c), float(lp)) for r, p, c, lp in vocab],
        "rank INT, piece STRING, n BIGINT, logp DOUBLE",
    )


# ---------------------------------------------------------------------------
# cross-format federation: Delta x Iceberg x Hudi in ONE plan
# ---------------------------------------------------------------------------


def _delta_nation_layout(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import os

    from .pipeline44 import _LAYOUT_ROOT, _atomic_layout

    src = os.path.join(sf_dir, "nation.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:deltanation8".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"nation_delta_{digest}")
    if not os.path.isdir(os.path.join(path, "_delta_log")):
        from ..sources.delta_log import delta_write

        with _atomic_layout(path) as tmp:
            delta_write(load_table(spark, sf_dir, "nation"), tmp)
    return path


def _iceberg_customer_layout(spark: SparkSession, sf_dir: str) -> str:
    import hashlib
    import os

    from .pipeline44 import _LAYOUT_ROOT, _atomic_layout

    src = os.path.join(sf_dir, "customer.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:icecust8".encode()
    ).hexdigest()[:12]
    path = os.path.join(_LAYOUT_ROOT, f"customer_iceberg_{digest}")
    if not os.path.isdir(os.path.join(path, "metadata")):
        from ..sources.iceberg import iceberg_write

        with _atomic_layout(path) as tmp:
            iceberg_write(
                load_table(spark, sf_dir, "customer").select(
                    "c_custkey", "c_nationkey", "c_acctbal"
                ),
                tmp,
            )
    return path


@declare(
    "table_multi_format_join",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_cust
      FROM customer GROUP BY 1),
    s AS (
      SELECT s_nationkey AS k, CAST(COUNT(*) AS BIGINT) AS n_supp,
             ROUND(SUM(CASE WHEN s_suppkey % 10 = 0
                            THEN s_acctbal + 1000.0
                            ELSE s_acctbal END), 2) AS supp_bal
      FROM supplier GROUP BY 1)
    SELECT n_name, n_cust, n_supp, supp_bal
    FROM nation
    JOIN c ON c.k = n_nationkey
    JOIN s ON s.k = n_nationkey
    """,
)
def table_multi_format_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-FORMAT FEDERATION: one Catalyst plan joining a live DELTA
    table (nation, commit-log scan), a live ICEBERG table (customer,
    manifest-planned scan), and a live HUDI table (supplier CoW across
    three commits including an upsert rewrite -- pipeline50's layout).
    Both fact sides pre-aggregate to one row per nation BEFORE the join
    (partial aggregation upstream, no fanout), and the 25-row nation
    dimension broadcasts.  The oracle recomputes the same join over the
    original parquet; agreement proves the three interop layers compose
    in one plan with every format's mutation history applied -- the
    supplier side must show the Hudi upsert's +1000 balances."""
    from ..sources.delta_log import delta_scan
    from ..sources.hudi import hudi_scan
    from ..sources.iceberg import iceberg_scan
    from .pipeline50 import _hudi_cow_layout

    nation = delta_scan(spark, _delta_nation_layout(spark, sf_dir))
    cust = iceberg_scan(spark, _iceberg_customer_layout(spark, sf_dir))
    supp = hudi_scan(spark, _hudi_cow_layout(spark, sf_dir))
    c_agg = cust.groupBy(F.col("c_nationkey").alias("k")).agg(
        F.count("*").alias("n_cust")
    )
    s_agg = supp.groupBy(F.col("s_nationkey").alias("k")).agg(
        F.count("*").alias("n_supp"),
        F.round(F.sum("s_acctbal"), 2).alias("supp_bal"),
    )
    return (
        c_agg.join(s_agg, "k")
        .join(
            F.broadcast(nation),
            F.col("k") == F.col("n_nationkey"),
        )
        .select("n_name", "n_cust", "n_supp", "supp_bal")
    )
