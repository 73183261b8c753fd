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
