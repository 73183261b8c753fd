"""Round-4 continuation batch 36: BPE merge training, ACID DELETE/UPDATE,
Johnson-Lindenstrauss projection, star-except projection.

- text_bpe_train: learn a BPE merge table FROM the corpus (the training
  side of the tokenizer; text_bpe_encode serves a fixed table) — an
  iterative Spark loop with one bounded driver reduction per merge.
  Rows-only (a k-step argmax loop is not SQL-expressible); pytest
  replays the identical algorithm in pure Python and pins the table.
- table_delete_update: the remaining two ACID DML verbs (MERGE landed as
  table_merge_upsert) — DELETE WHERE + UPDATE SET as crash-safe staged
  rewrites, proven against an oracle that recomputes the final state
  relationally from the pristine fixture.
- emb_random_projection_jl: dimensionality reduction by deterministic
  Gaussian random projection (64 -> 16), the cheap JL tier next to PCA /
  matryoshka / PQ — fully oracle-checked because the 'random' matrix is
  hash-derived arithmetic both engines compute identically.
- sql_except_columns: SELECT * EXCEPT — the wide-table projection
  shorthand (Spark 4), resolved at analysis time to an explicit column
  list, which is exactly what the oracle writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .registry import declare


@declare("text_bpe_train", oracle=None)  # rows-only: iterative argmax loop
def text_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE TRAINING on Spark (operators/tokenize.py bpe_train): the
    word-count relation (Zipf-bounded — this is what makes distributed
    BPE tractable: iterate over distinct words weighted by count, never
    the corpus) learns 10 merges in BATCHED rounds (batch_k=5): each
    round is one pair-explode + groupBy + ranked-prefix collect, a
    greedy non-interacting selection of up to 5 pairs, and ONE JVM
    aggregate() fold applying them all — ~5x fewer Spark job launches
    per learned merge than the classic one-merge-per-round loop (the
    round-5 verdict's scheduling-overhead item). Deterministic end to
    end (count-desc then lexicographic tie-break), so the learned table
    is stable across runs, partitionings and scales. Rows-only: the
    loop is not SQL-expressible; tests/test_pipeline36.py replays the
    identical batched algorithm in pure Python over the same word
    counts and pins every (step, pair, count) row."""
    from ..operators.tokenize import bpe_train

    d = load_table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split(F.lower("text"), " ")).alias("word"))
        .where((F.col("word") != "") & F.col("word").rlike("^[a-z]+$"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    merges = bpe_train(words, n_merges=10, batch_k=5)
    return spark.createDataFrame(
        [(int(s), a, b, int(n)) for s, a, b, n in merges],
        "step INT, sym_a STRING, sym_b STRING, pair_count BIGINT",
    )


@declare(
    "table_delete_update",
    oracle="""
    WITH after_delete AS (
      SELECT * FROM orders
      WHERE NOT (o_orderstatus = 'F' AND o_totalprice < 50000)),
    after_update AS (
      SELECT o_orderstatus,
             CASE WHEN o_totalprice >= 400000 THEN '1-URGENT'
                  ELSE o_orderpriority END AS o_orderpriority,
             o_totalprice
      FROM after_delete)
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total
    FROM after_update GROUP BY 1, 2
    """,
)
def table_delete_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive ACID DELETE + UPDATE on plain parquet (operators/
    maintenance.py): DELETE FROM t WHERE (low-value completed orders),
    then UPDATE t SET priority WHERE (high-value orders), each a staged
    copy-on-write rewrite behind the same atomic directory swap the
    MERGE analog uses — the full DML trio on one crash-safe write path.
    The query reads the table AFTER both statements; the oracle
    recomputes the final state relationally from the pristine fixture,
    so agreement proves both rewrites touched exactly the addressed rows
    and nothing else. Rewrites run once per fixture identity (the
    layout-cache discipline); at scale a partitioned table bounds each
    rewrite to the partitions the predicate reaches."""
    import hashlib
    import os
    import tempfile

    from ..operators.maintenance import delete_where, update_set

    src = os.path.join(sf_dir, "orders.parquet")
    st = os.stat(src)
    digest = hashlib.sha1(
        f"{src}:{st.st_mtime_ns}:{st.st_size}:dml".encode()
    ).hexdigest()[:12]
    root = os.path.join(
        tempfile.gettempdir(), "spark_graft_layouts", f"orders_dml_{digest}"
    )
    marker = os.path.join(root, "_DML_DONE")
    if not os.path.exists(marker):
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
        )
        o.write.mode("overwrite").parquet(root)
        delete_where(
            spark,
            root,
            (F.col("o_orderstatus") == "F") & (F.col("o_totalprice") < 50000),
        )
        update_set(
            spark,
            root,
            F.col("o_totalprice") >= 400000,
            {"o_orderpriority": F.lit("1-URGENT")},
        )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    t = spark.read.parquet(root)
    return t.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


JL_OUT_DIM = 16
JL_IN_DIM = 64


@declare(
    "emb_random_projection_jl",
    oracle=f"""
    WITH proj AS (
      SELECT vec_id,
             list_transform(generate_series(0, {JL_OUT_DIM - 1}), k ->
               list_sum(list_transform(generate_series(1, {JL_IN_DIM}), j ->
                 CAST(embedding[j] AS DOUBLE) *
                 sqrt(-2 * ln((CAST(((j * 1000 + k) * 2654435761) % 1000003
                               AS DOUBLE) + 1) / 1000004))
                 * cos(2 * pi() * (CAST(((j * 1000 + k) * 40503) % 65537
                                   AS DOUBLE) / 65537))
               )) / sqrt({JL_OUT_DIM}.0)) AS p,
             list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST(embedding AS DOUBLE[])) AS norm2_in
      FROM embeddings WHERE vec_id < 200)
    SELECT vec_id,
           ROUND(list_dot_product(p, p) / norm2_in, 6) AS norm_ratio,
           ROUND(p[1], 6) AS p0
    FROM proj
    """,
)
def emb_random_projection_jl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection 64 -> 16: the cheapest
    dimensionality-reduction tier (no training at all — PCA needs a
    pass, PQ needs k-means; JL needs a hash). The Gaussian matrix is
    DERIVED, not stored: g(j,k) = Box-Muller over two Knuth-hash
    uniforms of (j,k), so both engines rebuild the identical matrix and
    the whole projection is oracle-checked — and at 100 TB the matrix
    ships as a formula, not a broadcast. Per-vector output: squared-norm
    ratio (JL's distance-preservation guarantee made visible; E[ratio]
    = 1) and the first coordinate. Fixed summation order (sequence
    index) keeps the doubles bit-comparable before the 6-decimal
    display rounding."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    proj = F.expr(
        f"""
        transform(sequence(0, {JL_OUT_DIM - 1}), k ->
          aggregate(sequence(1, {JL_IN_DIM}),
            cast(0.0 as double),
            (acc, j) -> acc +
              cast(element_at(embedding, j) as double) *
              sqrt(-2 * ln((cast(((cast(j as bigint) * 1000 + k) * 2654435761)
                                 % 1000003 as double) + 1) / 1000004))
              * cos(2 * pi() * (cast(((cast(j as bigint) * 1000 + k) * 40503)
                                     % 65537 as double) / 65537))
          ) / sqrt({JL_OUT_DIM}.0))
        """
    )
    norm2_in = F.expr(
        "aggregate(zip_with(embedding, embedding,"
        " (a, b) -> cast(a as double) * cast(b as double)),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    p2 = F.expr(
        "aggregate(zip_with(p, p, (a, b) -> a * b),"
        " cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return (
        e.select("vec_id", proj.alias("p"), norm2_in.alias("norm2_in"))
        .select(
            "vec_id",
            F.round(p2 / F.col("norm2_in"), 6).alias("norm_ratio"),
            F.round(F.element_at("p", 1), 6).alias("p0"),
        )
    )


@declare(
    "sql_except_columns",
    oracle="""
    SELECT c_custkey, c_nationkey, c_mktsegment
    FROM customer WHERE c_custkey < 150
    """,
)
def sql_except_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * EXCEPT (Spark 4): the wide-table ergonomics for 'all
    columns but the sensitive/huge ones' — resolved at ANALYSIS time to
    an explicit projection, so column pruning reaches the scan exactly
    as if the list were written out (which is what the oracle does).
    Zero runtime surface of its own; declaring it pins the parser/
    analyzer path."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_exc_customer")
    return spark.sql(
        "SELECT * EXCEPT (c_name, c_acctbal) FROM _exc_customer"
        " WHERE c_custkey < 150"
    )
