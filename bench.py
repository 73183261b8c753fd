"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints exactly ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Query set mirrors BASELINE.md so the driver can compare directly; the
cosine self-join uses the engine's blockwise mapInPandas operator (the
BASELINE number is the naive 4M-pair expression join).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _multifile_dir(spark, sf_dir: str, nfiles: int) -> str:
    """Rewrite the fixture tables into an nfiles-per-table layout (once,
    cached) and return the new dir. Single-file fixtures cap local scan
    parallelism at one task per row-group; a production lake is many files,
    and tests/test_multifile.py pins that results are layout-invariant.
    Opt-in via SPARK_GRAFT_MULTIFILE so default numbers stay comparable
    with BASELINE.md's single-file methodology."""
    import shutil

    from hive_person_service_spark.sources import TABLES
    from hive_person_service_spark.sources.schemas import SCHEMAS

    tag = sf_dir.rstrip("/").replace("/", "_")
    out = f"/tmp/spark_graft_mf{nfiles}v2_{tag}"
    done = os.path.join(out, "_DONE")
    if not os.path.exists(done):
        shutil.rmtree(out, ignore_errors=True)
        for t in TABLES:
            if t == "events":
                # Native-schema read round-trips whichever physical ts
                # encoding the fixture uses (int64 nanos or timestamp[us]);
                # the loader re-detects on the rewritten files.
                df = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
            else:
                df = spark.read.schema(SCHEMAS[t]).parquet(
                    os.path.join(sf_dir, f"{t}.parquet")
                )
            df.repartition(nfiles).write.mode("overwrite").parquet(
                os.path.join(out, f"{t}.parquet")
            )
        with open(done, "w") as fh:
            fh.write("ok")
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from hive_person_service_spark import plans
    from hive_person_service_spark.operators.similarity import (
        exact_topk_pairs_blockwise,
    )
    from hive_person_service_spark.session import get_spark
    from hive_person_service_spark.sources import load_table

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")
    load_at_start = round(os.getloadavg()[0], 2)

    # Warm the JVM + page cache (BASELINE.md methodology), and the Python
    # worker pool (first pandas-UDF call otherwise pays ~5s of fork+Arrow
    # startup inside whichever query touches Python first).
    for t in ("lineitem", "orders", "events"):
        load_table(spark, sf_dir, t).count()
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    _noop = F.pandas_udf(lambda s: s, LongType())
    spark.range(256).repartition(64).select(_noop("id")).count()

    qs = plans.all_queries()

    def headline(d: str) -> dict:
        return {
            "q_pricing_summary": lambda: qs["agg_groupby"](spark, d),
            "q_join3_revenue": lambda: qs["join3_revenue"](spark, d),
            "q_window_topk": lambda: qs["win_topk_per_group"](spark, d),
            "q_events_window": lambda: qs["stream_tumbling"](spark, d),
            "q_distinct_users": lambda: qs["agg_count_distinct"](spark, d),
            "q_sort_limit": lambda: qs["sort_limit_topk"](spark, d),
            "q_cosine_selfjoin_top10": lambda: exact_topk_pairs_blockwise(
                spark, load_table(spark, d, "embeddings"), k=10
            ),
            "q_dedup_near_lsh": lambda: qs["dedup_near"](spark, d),
            "q_sim_topk": lambda: qs["sim_topk"](spark, d),
        }

    def run(queries: dict) -> dict[str, float]:
        # Best of 3: single-shot numbers on a shared box swing 2-3x with
        # ambient load; min-of-3 reports the machine, not the neighbors.
        # (The artifact also records the box's 1-min load average at
        # start and end so a load-confounded capture self-documents.)
        timings: dict[str, float] = {}
        for name, build in queries.items():
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                build().collect()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)
        return timings

    # Primary numbers: the fixture's single-file layout, comparable with
    # BASELINE.md's methodology and prior rounds.
    timings = run(headline(sf_dir))

    # Co-bucketed fact-fact join (setup cost excluded -- at 100 TB the
    # bucketed layout is how the tables are STORED, not per-query work):
    # the orders x lineitem SMJ runs with no Exchange under the join.
    from hive_person_service_spark.plans.joins import (
        join3_revenue_bucketed,
        setup_bucketed_join3,
    )

    setup_bucketed_join3(spark, sf_dir)
    extras = run(
        {
            "q_join3_revenue_bucketed": lambda: join3_revenue_bucketed(spark, sf_dir),
            # round-6 headline additions (tracked here so `value` stays
            # comparable with prior rounds / BASELINE.md's original set;
            # baseline counterparts are in BASELINE.md methodology notes):
            # an open-table-format scan (Delta log replay + pruned parquet
            # scan) and a real multimodal decode (PGM/BMP/PNG decode +
            # resize + checksum through Arrow batches).
            "q_table_delta_scan": lambda: qs["table_delta_scan"](spark, sf_dir),
            "q_multimodal_decode": lambda: qs["multimodal_decode_resize"](
                spark, sf_dir
            ),
            # round-7 addition: Hudi MOR snapshot (timeline replay, base
            # parquet + HoodieLogFormat Avro/delete blocks merged per
            # record key) -- the most involved open-format read path
            "q_table_hudi_mor_read": lambda: qs["table_hudi_mor_read"](
                spark, sf_dir
            ),
            # round-8 addition: gradient-boosted stump training (3
            # histogram-split-search rounds over lineitem in exact
            # integer micro-units) -- the iterative-ML cost anchor
            "q_ml_train_gbt": lambda: qs["ml_train_gbt"](spark, sf_dir),
        }
    )

    # Lake-realistic layout: same tables rewritten as 32 files/table
    # (results are layout-invariant -- tests/test_multifile.py). Opt out
    # with SPARK_GRAFT_MULTIFILE=0; any N>1 overrides the file count.
    nfiles = int(os.environ.get("SPARK_GRAFT_MULTIFILE", "32"))
    multifile = None
    if nfiles > 1:
        mf_dir = _multifile_dir(spark, sf_dir, nfiles)
        mf_timings = run(headline(mf_dir))
        multifile = {
            "nfiles": nfiles,
            "value": round(sum(mf_timings.values()), 3),
            "queries": mf_timings,
        }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    result = {
        "metric": "headline_queries_total_wall_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "layout": "single-file",
        # box contention self-documentation: 1-min load average at
        # session start and at report time (32 cores; >> ~8 at start
        # means the capture ran against noisy neighbors)
        "load_avg_1m": {"start": load_at_start,
                        "end": round(os.getloadavg()[0], 2)},
        "reps": 3,
        # not in `value`: no BASELINE counterpart (layout demo, not a query)
        "extras": extras,
    }
    if multifile is not None:
        result["multifile"] = multifile
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
