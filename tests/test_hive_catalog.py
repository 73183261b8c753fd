"""Hive-metastore-backed catalog path (SURVEY.md §2.A "catalog/Hive table
scan"): saveAsTable through a real HMS (embedded Derby) and resolution back
through spark.table / spark.sql.

Runs in a subprocess: spark.sql.catalogImplementation is a STATIC conf tied
to the shared SparkContext's SharedState, so it cannot be flipped on the
session-scoped test fixture. One subprocess bootstraps a throwaway Derby
metastore under tmp_path and exercises the full write-catalog-read loop.
"""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
from pathlib import Path

REPO = str(Path(__file__).resolve().parents[1])


def test_hive_metastore_save_and_read(tmp_path):
    script = textwrap.dedent(
        f"""
        import os
        from pyspark.sql import SparkSession

        d = {str(tmp_path)!r}
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("hive-catalog-test")
            .config("spark.sql.catalogImplementation", "hive")
            .config("spark.sql.warehouse.dir", os.path.join(d, "wh"))
            .config(
                "spark.driver.extraJavaOptions",
                "-Dderby.system.home=" + os.path.join(d, "derby"),
            )
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .enableHiveSupport()
            .getOrCreate()
        )
        assert spark.conf.get("spark.sql.catalogImplementation") == "hive"

        from hive_person_service_spark.sources import load_table

        nation = load_table(spark, "/root/testdata/sf0.001", "nation")
        n = nation.count()
        nation.write.mode("overwrite").saveAsTable("nation_hms")

        # Resolution through the metastore, not a temp view.
        assert "nation_hms" in [t.name for t in spark.catalog.listTables()]
        assert spark.table("nation_hms").count() == n
        got = spark.sql(
            "SELECT COUNT(*) AS c FROM nation_hms WHERE n_regionkey = 0"
        ).first()["c"]
        want = nation.where("n_regionkey = 0").count()
        assert got == want

        # INSERT INTO via the catalog surface appends through HMS too.
        spark.sql(
            "INSERT INTO nation_hms SELECT * FROM nation_hms WHERE n_nationkey = 0"
        )
        assert spark.table("nation_hms").count() == n + 1

        spark.stop()
        print("HIVE_OK")
        """
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env=env,
    )
    assert "HIVE_OK" in out.stdout, (
        f"stdout tail: {out.stdout[-2000:]}\nstderr tail: {out.stderr[-2000:]}"
    )


def test_hive_partition_ddl(tmp_path):
    """Partitioned-table DDL against the real HMS (VERDICT r3 item 3): a
    date-partitioned saveAsTable, SHOW PARTITIONS listing one entry per
    day, partition-predicate reads resolved through the catalog, ALTER
    TABLE ADD/DROP PARTITION, and MSCK REPAIR picking up a directory
    dropped in from outside the catalog -- the day-to-day Hive idioms a
    reference user would exercise first."""
    script = textwrap.dedent(
        f"""
        import os
        from pyspark.sql import SparkSession, functions as F

        d = {str(tmp_path)!r}
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("hive-partition-ddl-test")
            .config("spark.sql.catalogImplementation", "hive")
            .config("spark.sql.warehouse.dir", os.path.join(d, "wh"))
            .config(
                "spark.driver.extraJavaOptions",
                "-Dderby.system.home=" + os.path.join(d, "derby"),
            )
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .enableHiveSupport()
            .getOrCreate()
        )
        from hive_person_service_spark.sources import load_table

        ev = load_table(spark, "/root/testdata/sf0.001", "events")
        ev = ev.withColumn("event_date", F.to_date("ts").cast("string"))
        (
            ev.write.mode("overwrite")
            .partitionBy("event_date")
            .format("parquet")
            .saveAsTable("events_part")
        )

        parts = [r[0] for r in spark.sql("SHOW PARTITIONS events_part").collect()]
        n_days = ev.select("event_date").distinct().count()
        assert len(parts) == n_days, (len(parts), n_days)
        assert all(p.startswith("event_date=") for p in parts)

        # catalog-resolved partition-predicate read
        first_day = sorted(parts)[0].split("=", 1)[1]
        got = spark.sql(
            "SELECT COUNT(*) AS c FROM events_part WHERE event_date = '"
            + first_day + "'"
        ).first()["c"]
        want = ev.where(F.col("event_date") == first_day).count()
        assert got == want > 0

        # ADD PARTITION: empty partition registered in HMS
        spark.sql(
            "ALTER TABLE events_part ADD PARTITION (event_date='2099-01-01')"
        )
        parts2 = [r[0] for r in spark.sql("SHOW PARTITIONS events_part").collect()]
        assert "event_date=2099-01-01" in parts2
        assert spark.table("events_part").count() == ev.count()

        # DROP PARTITION: rows of that day disappear from the table
        spark.sql(
            "ALTER TABLE events_part DROP PARTITION (event_date='"
            + first_day + "')"
        )
        assert spark.table("events_part").count() == ev.count() - want

        # MSCK REPAIR: a directory landed outside the catalog becomes a
        # partition after repair (the crawler-landing recovery idiom)
        detail = spark.sql("DESCRIBE FORMATTED events_part").collect()
        location = next(
            r.data_type for r in detail if r.col_name.strip() == "Location"
        )
        path = location.replace("file:", "")
        stray = os.path.join(path, "event_date=2098-12-31")
        os.makedirs(stray, exist_ok=True)
        ev.where(F.col("event_date") == first_day).drop(
            "event_date"
        ).limit(5).write.mode("overwrite").parquet(stray)
        spark.sql("MSCK REPAIR TABLE events_part")
        parts3 = [r[0] for r in spark.sql("SHOW PARTITIONS events_part").collect()]
        assert "event_date=2098-12-31" in parts3
        assert spark.sql(
            "SELECT COUNT(*) AS c FROM events_part "
            "WHERE event_date = '2098-12-31'"
        ).first()["c"] == 5

        spark.stop()
        print("HIVE_DDL_OK")
        """
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env=env,
    )
    assert "HIVE_DDL_OK" in out.stdout, (
        f"stdout tail: {out.stdout[-2000:]}\nstderr tail: {out.stderr[-2000:]}"
    )


def test_hive_ctas_and_views(tmp_path):
    """CTAS + view DDL through the metastore: CREATE TABLE AS SELECT,
    CREATE VIEW over it, SHOW TABLES listing both, DESCRIBE resolving the
    schema, DROP cascading correctly -- the remaining everyday Hive DDL
    beyond save/read/partitions."""
    script = textwrap.dedent(
        f"""
        import os
        from pyspark.sql import SparkSession

        d = {str(tmp_path)!r}
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("hive-ctas-test")
            .config("spark.sql.catalogImplementation", "hive")
            .config("spark.sql.warehouse.dir", os.path.join(d, "wh"))
            .config(
                "spark.driver.extraJavaOptions",
                "-Dderby.system.home=" + os.path.join(d, "derby"),
            )
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .enableHiveSupport()
            .getOrCreate()
        )
        from hive_person_service_spark.sources import load_table

        load_table(spark, "/root/testdata/sf0.001", "nation") \\
            .createOrReplaceTempView("nation_src")

        # CTAS through the metastore
        spark.sql(
            "CREATE TABLE nations_eu USING parquet AS "
            "SELECT n_nationkey, n_name FROM nation_src WHERE n_regionkey = 3"
        )
        want = spark.table("nation_src").where("n_regionkey = 3").count()
        assert spark.table("nations_eu").count() == want > 0

        # persistent VIEW over the CTAS table
        spark.sql(
            "CREATE VIEW nations_eu_upper AS "
            "SELECT n_nationkey, UPPER(n_name) AS n_name FROM nations_eu"
        )
        names = {{r.n_name for r in spark.table("nations_eu_upper").collect()}}
        assert names and all(n == n.upper() for n in names)

        tables = {{t.name: t.tableType for t in spark.catalog.listTables()}}
        assert tables.get("nations_eu") in ("MANAGED", "EXTERNAL")
        assert tables.get("nations_eu_upper") == "VIEW"

        cols = {{r.col_name for r in spark.sql("DESCRIBE nations_eu").collect()}}
        assert {{"n_nationkey", "n_name"}} <= cols

        # dropping the view leaves the table; dropping the table works
        spark.sql("DROP VIEW nations_eu_upper")
        assert spark.table("nations_eu").count() == want
        spark.sql("DROP TABLE nations_eu")
        remaining = [t.name for t in spark.catalog.listTables()]
        assert "nations_eu" not in remaining

        spark.stop()
        print("HIVE_CTAS_OK")
        """
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env=env,
    )
    assert "HIVE_CTAS_OK" in out.stdout, (
        f"stdout tail: {out.stdout[-2000:]}\nstderr tail: {out.stderr[-2000:]}"
    )


def test_hive_analyze_cbo_stats(tmp_path):
    """Hive ANALYZE TABLE surface + CBO statistics (SURVEY.md §4 'join
    reordering' row: built-in, opt-in -- enable + analyze): table-level
    COMPUTE STATISTICS lands rowCount/sizeInBytes in the HMS, column-level
    FOR COLUMNS lands ndv/min/max, and with spark.sql.cbo.enabled the
    optimized plan's stats carry the cataloged rowCount (what
    CostBasedJoinReorder and broadcast selection consume at 100 TB, where
    file listing alone can't size inputs cheaply)."""
    script = textwrap.dedent(
        f"""
        import os
        from pyspark.sql import SparkSession

        d = {str(tmp_path)!r}
        spark = (
            SparkSession.builder.master("local[2]")
            .appName("hive-analyze-test")
            .config("spark.sql.catalogImplementation", "hive")
            .config("spark.sql.warehouse.dir", os.path.join(d, "wh"))
            .config(
                "spark.driver.extraJavaOptions",
                "-Dderby.system.home=" + os.path.join(d, "derby"),
            )
            .config("spark.ui.enabled", "false")
            .config("spark.sql.shuffle.partitions", "4")
            .config("spark.sql.cbo.enabled", "true")
            .enableHiveSupport()
            .getOrCreate()
        )

        from hive_person_service_spark.sources import load_table

        orders = load_table(spark, "/root/testdata/sf0.001", "orders")
        n = orders.count()
        orders.write.mode("overwrite").saveAsTable("orders_hms")

        spark.sql("ANALYZE TABLE orders_hms COMPUTE STATISTICS")
        spark.sql(
            "ANALYZE TABLE orders_hms COMPUTE STATISTICS "
            "FOR COLUMNS o_custkey, o_totalprice"
        )

        # table-level stats visible through DESCRIBE EXTENDED
        rows = spark.sql("DESCRIBE TABLE EXTENDED orders_hms").collect()
        stats = [r.data_type for r in rows if r.col_name == "Statistics"]
        assert stats and str(n) + " rows" in stats[0], stats

        # column-level stats: ndv/min/max recorded
        crows = spark.sql(
            "DESCRIBE TABLE EXTENDED orders_hms o_custkey"
        ).collect()
        cmap = dict((r.info_name, r.info_value) for r in crows)
        assert cmap.get("distinct_count") not in (None, "NULL"), cmap
        assert cmap.get("min") not in (None, "NULL"), cmap
        assert cmap.get("max") not in (None, "NULL"), cmap

        # CBO consumes the cataloged rowCount in the optimized plan
        jstats = (
            spark.table("orders_hms")
            ._jdf.queryExecution().optimizedPlan().stats()
        )
        assert jstats.rowCount().isDefined()
        assert int(str(jstats.rowCount().get())) == n

        spark.stop()
        print("HIVE_STATS_OK")
        """
    )
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
        env=env,
    )
    assert "HIVE_STATS_OK" in out.stdout, (
        f"stdout tail: {out.stdout[-2000:]}\\nstderr tail: {out.stderr[-2000:]}"
    )
