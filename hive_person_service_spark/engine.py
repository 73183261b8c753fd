"""Engine facade -- the one-import surface a user of the reference service
switches to.

    from hive_person_service_spark.engine import Engine

    eng = Engine.local()                       # or Engine(existing_spark)
    eng.attach("/data/lake/sf0.1")             # registers catalog views
    eng.sql("SELECT ... FROM lineitem ...")    # HiveQL-shaped SQL
    eng.table("orders")                        # DataFrame API
    eng.near_duplicates(eng.table("documents"))
    eng.topk_similar(query_vec, k=10)

Thin by design: every method returns a plain DataFrame and delegates to the
operator library, so users compose engine ops with arbitrary PySpark.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession

from .operators.dedup import exact_dedup, near_duplicates_minhash
from .operators.ivf import build_ivf, ivf_topk
from .operators.joins import asof_join, topk_per_group
from .operators.maintenance import compact_parquet, merge_upsert
from .session import configure, get_spark
from .sources import load_table, register_views


class Engine:
    """Session + catalog + operator library behind one handle."""

    def __init__(self, spark: SparkSession):
        self.spark = configure(spark)
        self.sf_dir: str | None = None

    @classmethod
    def local(cls, **kwargs) -> "Engine":
        return cls(get_spark(**kwargs))

    # -- catalog ---------------------------------------------------------
    def attach(self, sf_dir: str) -> "Engine":
        """Register every fixture-schema table under its name (the
        Hive-tables surface: spark.sql sees them like HMS tables)."""
        self.sf_dir = sf_dir
        register_views(self.spark, sf_dir)
        return self

    def table(self, name: str) -> DataFrame:
        if self.sf_dir is None:
            raise RuntimeError("call attach(sf_dir) first")
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- composite operators --------------------------------------------
    def top_orders_per_customer(self, k: int = 3) -> DataFrame:
        from pyspark.sql import functions as F

        return topk_per_group(
            self.table("orders").select("o_custkey", "o_orderkey", "o_totalprice"),
            partition_by=["o_custkey"],
            order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
            k=k,
        )

    def asof(self, left: DataFrame, right: DataFrame, **kw) -> DataFrame:
        return asof_join(left, right, **kw)

    def dedup(self, docs: DataFrame) -> DataFrame:
        return exact_dedup(docs)

    def near_duplicates(self, docs: DataFrame, threshold: float = 0.7) -> DataFrame:
        return near_duplicates_minhash(docs, threshold=threshold)

    def dedup_clusters(self, docs: DataFrame, threshold: float = 0.9) -> DataFrame:
        """(doc_id, canon, keep): near-dup pairs collapsed to groups."""
        from .operators.clustering import dedup_groups

        pairs = near_duplicates_minhash(docs, threshold=threshold)
        return dedup_groups(docs.select("doc_id"), pairs)

    def split(self, df: DataFrame, id_col: str, fractions, seed: int = 42):
        """Reproducible hash-bucket train/val/test splits."""
        from .operators.splits import hash_split

        return hash_split(df, id_col, fractions, seed=seed)

    def topk_similar(
        self, query_vec: Sequence[float], k: int = 10, nlist: int = 16, nprobe: int = 8
    ) -> DataFrame:
        assigned, centroids = build_ivf(self.table("embeddings"), nlist=nlist)
        return ivf_topk(
            assigned, centroids, np.asarray(query_vec, dtype=np.float64), k=k,
            nprobe=nprobe,
        )

    # -- maintenance -----------------------------------------------------
    def merge(self, target_path: str, updates: DataFrame, keys: Sequence[str]) -> None:
        merge_upsert(self.spark, target_path, updates, keys)

    def compact(self, path: str, target_file_bytes: int = 128 * 1024 * 1024) -> int:
        return compact_parquet(self.spark, path, target_file_bytes)

    # -- profile history (SCD2) ------------------------------------------
    def scd2_merge(
        self,
        history: DataFrame,
        updates: DataFrame,
        keys: Sequence[str],
        tracked: Sequence[str],
        ts_col: str = "ts",
    ) -> DataFrame:
        from .operators.scd import scd2_merge

        return scd2_merge(history, updates, keys, tracked, ts_col)

    def profile_as_of(self, history: DataFrame, ts: str) -> DataFrame:
        from .operators.scd import scd2_as_of

        return scd2_as_of(history, ts)

    # -- data skipping ----------------------------------------------------
    def stats_index(self, table_path: str, columns: Sequence[str]) -> DataFrame:
        from .operators.skipping import build_stats_index

        return build_stats_index(self.spark, table_path, columns)

    def range_scan(
        self,
        table_path: str,
        stats: DataFrame,
        column: str,
        lo: float,
        hi: float,
    ) -> DataFrame:
        from .operators.skipping import skipping_scan

        return skipping_scan(self.spark, table_path, stats, column, lo, hi)

    # -- governance -------------------------------------------------------
    def erase(self, table_path: str, keys: DataFrame, key_col: str) -> dict:
        """GDPR erasure with a receipt (operators/governance.py)."""
        from .operators.governance import erase_rows

        return erase_rows(self.spark, table_path, keys, key_col)

    def pseudonymize(
        self, df: DataFrame, key_col: str, salt: str, drop: Sequence[str] = ()
    ) -> DataFrame:
        from .operators.governance import pseudonymize

        return pseudonymize(df, key_col, salt, drop=list(drop))
