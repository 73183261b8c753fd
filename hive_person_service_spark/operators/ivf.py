"""IVF (inverted-file) approximate nearest-neighbor search (SURVEY.md §2.J
"similarity search: IVF variant as the scale path").

Build: k-means (pyspark.ml, seeded -> deterministic) partitions the corpus
into nlist cells; each vector is stored with its cell id (at 100 TB:
written as a parquet table partitioned/bucketed by cell).

Search: score the query against the nlist centroids driver-side (nlist is
small -- thousands at most), probe only the nprobe nearest cells, exact
cosine within them. IO and compute drop by ~nlist/nprobe vs brute force;
recall is tunable via nprobe (pytest pins recall@10 >= 0.7 at nprobe=4,
nlist=16 on the fixtures).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine_expr, to_double_array


def build_ivf(
    emb: DataFrame,
    nlist: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    max_iter: int = 8,
    init_mode: str = "k-means||",
) -> tuple[DataFrame, np.ndarray]:
    """Assign every vector to an IVF cell. Returns (assigned, centroids):
    assigned = emb columns + ``cell``; centroids = (nlist, dim) ndarray.

    max_iter=8 default: cell quality plateaus early for ANN partitioning
    (cells only gate candidate generation; exact scoring happens in-cell).
    Full-probe callers (nprobe == nlist) are exact under ANY partition, so
    they can pass max_iter=2 + init_mode='random' and skip most of the
    index-build jobs (k-means|| init is itself several passes)."""
    feat = emb.withColumn("__features", array_to_vector(to_double_array("embedding")))
    model = KMeans(
        k=nlist,
        seed=seed,
        maxIter=max_iter,
        initMode=init_mode,
        featuresCol="__features",
        predictionCol="cell",
    ).fit(feat)
    assigned = model.transform(feat).drop("__features")
    centroids = np.array(model.clusterCenters(), dtype=np.float64)
    return assigned, centroids


def write_ivf_index(
    emb: DataFrame,
    root: str,
    nlist: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
) -> None:
    """Persist an IVF index: vectors written partitioned by cell
    (``root/vectors/cell=N/``) + centroids as JSON. A probe then reads ONLY
    the nprobe cell directories -- partition pruning does the index lookup,
    so probe IO is ~nprobe/nlist of the corpus at any scale."""
    import json
    from pathlib import Path

    assigned, centroids = build_ivf(emb, nlist=nlist, seed=seed, id_col=id_col)
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{root}/vectors")
    Path(root, "centroids.json").write_text(json.dumps(centroids.tolist()))


def read_ivf_index(spark, root: str) -> tuple[DataFrame, np.ndarray]:
    """Load a persisted IVF index: (partitioned vectors DF, centroids)."""
    import json
    from pathlib import Path

    vectors = spark.read.parquet(f"{root}/vectors")
    centroids = np.array(json.loads(Path(root, "centroids.json").read_text()))
    return vectors, centroids


def assign_cells(emb: DataFrame, centroids: np.ndarray) -> DataFrame:
    """Assign vectors to their nearest EXISTING centroid (the k-means
    assignment metric, argmin ||x-c||^2) without re-clustering -- the
    incremental-maintenance primitive: new vectors join the index the
    same way a k-means iteration would place them, so probe ranking
    stays consistent with the build. Arrow-batched numpy against the
    broadcast centroid matrix."""
    from pyspark.sql.types import IntegerType

    cents = np.asarray(centroids, dtype=np.float64)
    half_sq = 0.5 * np.sum(cents**2, axis=1)

    @F.pandas_udf(IntegerType())
    def nearest_cell(col: pd.Series) -> pd.Series:
        m = np.array(list(col), dtype=np.float64)
        return pd.Series(np.argmax(m @ cents.T - half_sq, axis=1).astype("int32"))

    return emb.withColumn("cell", nearest_cell("embedding"))


def ivf_add_vectors(spark, root: str, new_emb: DataFrame) -> int:
    """Incrementally ADD vectors to a persisted IVF index: assign against
    the stored centroids (no re-clustering, no touch of existing cells)
    and APPEND to the partitioned layout -- only the cell directories the
    new vectors land in gain files. Returns the number of rows added.
    At scale this is the nightly-ingest shape: index growth is append-only
    until a periodic re-train rebalances cells."""
    import json
    from pathlib import Path

    centroids = np.array(json.loads(Path(root, "centroids.json").read_text()))
    assigned = assign_cells(new_emb, centroids)
    n = assigned.count()
    assigned.write.mode("append").partitionBy("cell").parquet(f"{root}/vectors")
    return n


def ivf_delete_vectors(spark, root: str, ids, id_col: str = "vec_id") -> int:
    """Incrementally DELETE vectors from a persisted IVF index: locate the
    cells holding the ids (one pruned scan), then rewrite ONLY those cell
    partitions via dynamic partition overwrite -- untouched cells keep
    their files byte-identical (pytest pins this). Returns rows deleted.

    ``ids`` may be a Python list (small maintenance batches: stays an
    in-plan literal predicate) or a DataFrame of ids (large delete sets:
    broadcast semi/anti joins, so the plan size is independent of the
    delete cardinality -- the 100 TB shape; a million-literal ``isin``
    would bloat the plan itself)."""
    from pyspark.sql import DataFrame as _DF

    vectors = spark.read.parquet(f"{root}/vectors")
    if isinstance(ids, _DF):
        ids_df = F.broadcast(
            ids.select(F.col(ids.columns[0]).cast("long").alias(id_col))
            .distinct()
        )
        matches = vectors.join(ids_df, id_col, "semi")

        def drop_deleted(df):
            return df.join(ids_df, id_col, "left_anti")
    else:
        id_set = [int(i) for i in ids]
        matches = vectors.where(F.col(id_col).isin(id_set))

        def drop_deleted(df):
            return df.where(~F.col(id_col).isin(id_set))
    affected = [
        r.cell for r in matches.select("cell").distinct().collect()
    ]
    if not affected:
        return 0
    before = vectors.where(F.col("cell").isin(affected)).count()
    # Materialize survivors BEFORE overwriting: a lazy plan would read the
    # same path the write overwrites, which is not a stable Spark contract
    # (other versions/committers raise or can corrupt). localCheckpoint
    # snapshots the affected cells' survivors (bounded: only the touched
    # partitions) so the overwrite reads from block storage, not the path.
    survivors = drop_deleted(
        vectors.where(F.col("cell").isin(affected))
    ).localCheckpoint(eager=True)
    surviving_cells = {
        r.cell for r in survivors.select("cell").distinct().collect()
    }
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        survivors.write.mode("overwrite").partitionBy("cell").parquet(
            f"{root}/vectors"
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # dynamic overwrite only rewrites partitions PRESENT in the written
    # data -- a cell whose every vector was deleted must be dropped by hand
    import shutil
    from pathlib import Path

    for cell in set(affected) - surviving_cells:
        shutil.rmtree(Path(root, "vectors", f"cell={cell}"), ignore_errors=True)
    after = spark.read.parquet(f"{root}/vectors").where(
        F.col("cell").isin(affected)
    ).count()
    return before - after


def ivf_knn_join(
    anchors: DataFrame,
    assigned: DataFrame,
    centroids: np.ndarray,
    k: int = 3,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """kNN JOIN on the IVF tier: top-k neighbors for EVERY anchor row,
    with candidates meeting only through an equi-join on cell id -- never a
    BroadcastNestedLoopJoin over the corpus.

    Shape: each anchor picks its nprobe nearest cells (Arrow-batched numpy
    against the broadcast centroid matrix -- centroids are tiny), explodes
    to (anchor, cell) rows, equi-joins the cell-assigned corpus, scores
    exact cosine in-cell, and keeps the per-anchor top-k window. Each
    corpus vector lives in exactly one cell, so a pair can meet at most
    once -- no dedup pass. At nprobe == nlist the candidate set is
    exhaustive and the result is exactly the brute-force kNN join (the
    oracle form); shrinking nprobe trades recall for ~nlist/nprobe less
    join IO -- the knob the 100 TB run turns."""
    from pyspark.sql import Window
    from pyspark.sql.types import ArrayType, IntegerType

    cents = np.asarray(centroids, dtype=np.float64)
    n_probe = min(nprobe, len(cents))

    # Rank probe cells by the ASSIGNMENT metric (Euclidean k-means):
    # nearest cell = argmin ||x-c||^2 = argmax (x.c - ||c||^2/2). Ranking
    # by raw dot product would skip an anchor's own cell whenever centroid
    # norms vary, silently costing recall at nprobe < nlist.
    half_sq = 0.5 * np.sum(cents**2, axis=1)

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_cells(col: pd.Series) -> pd.Series:
        m = np.array(list(col), dtype=np.float64)
        top = np.argsort(-(m @ cents.T - half_sq), axis=1)[:, :n_probe]
        return pd.Series(list(top.astype("int32")))

    a = anchors.select(
        F.col(id_col).alias("a_id"),
        to_double_array("embedding").alias("va"),
        F.explode(probe_cells("embedding")).alias("cell"),
    )
    b = assigned.select(
        "cell", F.col(id_col).alias("b_id"), to_double_array("embedding").alias("vb")
    )
    scored = (
        a.join(b, "cell")
        .where(F.col("a_id") != F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(cosine_expr(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("a_id").orderBy(F.col("cos").desc(), F.col("b_id"))
    return scored.withColumn(
        "neighbor_rank", F.row_number().over(w).cast("long")
    ).where(F.col("neighbor_rank") <= k)


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k cosine neighbors of ``query_vec`` probing the nprobe nearest
    cells only. Cell selection is a driver-side numpy dot (centroids are
    tiny); the probed scan is a partition-pruned filter at scale."""
    q = np.asarray(query_vec, dtype=np.float64)
    # Assignment-metric probe ranking (see ivf_knn_join).
    cells = np.argsort(
        -(centroids @ q - 0.5 * np.sum(centroids**2, axis=1))
    )[:nprobe].tolist()
    qlit = F.array(*[F.lit(float(x)) for x in q])
    return (
        assigned.where(F.col("cell").isin(cells))
        .select(
            id_col,
            F.round(cosine_expr(to_double_array("embedding"), qlit), 6).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), id_col)
        .limit(k)
    )
