"""Physical-plan audit (the 100 TB checklist): for each declared query,
print .explain('formatted') evidence that
  * filters reach the parquet scan (PushedFilters),
  * only needed columns are read (ReadSchema),
  * dim joins broadcast (BroadcastHashJoin),
  * top-k windows use the rank-limit pushdown (WindowGroupLimit),
  * pipelines fuse (WholeStageCodegen spans).

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.01"

CHECKS = {
    "pushed_filter": re.compile(r"PushedFilters: \[[^\]]"),
    "read_schema": re.compile(r"ReadSchema: struct<([^>]*)>"),
    "broadcast_join": re.compile(r"BroadcastHashJoin|BroadcastNestedLoopJoin"),
    "sortmerge_join": re.compile(r"SortMergeJoin"),
    "window_group_limit": re.compile(r"WindowGroupLimit"),
    "take_ordered": re.compile(r"TakeOrderedAndProject"),
    "codegen": re.compile(r"WholeStageCodegen"),
    "python_in_plan": re.compile(r"ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas"),
    "exchange": re.compile(r"Exchange (hashpartitioning|rangepartitioning|SinglePartition)"),
}


def main() -> int:
    from hive_person_service_spark import plans
    from hive_person_service_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = plans.all_queries()
    names = sys.argv[1:] or sorted(qs)
    for name in names:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        found = {}
        for key, rx in CHECKS.items():
            m = rx.findall(plan)
            if m:
                found[key] = len(m) if key != "read_schema" else m
        print(f"== {name}: {found}")
        if len(names) <= 3:
            print(plan)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
