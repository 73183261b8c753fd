"""Registry of declared queries: q-name -> (Spark builder, DuckDB oracle).

Contract (driver verify, __spark_entry__.py):
  * builder(spark, sf_dir) -> DataFrame
  * oracle: equivalent DuckDB SQL over the pre-registered views, or None for
    non-SQL-expressible operators (-> weaker rows-only check).

Oracle-agreement conventions (SURVEY.md §5.3) applied by every declared
query -- violating any of these is the #1 source of hash flakes:
  * alias every computed column identically in Spark and SQL;
  * per-row double arithmetic is left unrounded (bit-identical IEEE ops);
  * accumulation-order-dependent aggregates (sum/avg/stddev/corr over
    doubles) are rounded in-query: money sums -> 2, avgs/stats -> 4,
    transcendental-function outputs (exp/ln/pow, cosine) -> 6;
  * computed integer columns are cast to BIGINT on the Spark side (DuckDB
    defaults year()/row_number()/count() etc. to BIGINT; Spark to INT);
  * no DATE or FLOAT or ARRAY output columns: dates -> 'yyyy-MM-dd' strings,
    floats -> double, arrays -> sorted joined strings (stable hashing);
  * LIMIT queries order by a unique tie-break key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class DeclaredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, DeclaredQuery] = {}


def declare(name: str, oracle: str | None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as the builder for declared query ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = DeclaredQuery(name, fn, oracle, fn.__doc__ or "")
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    return {n: d.fn for n, d in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    return {n: d.oracle for n, d in REGISTRY.items() if d.oracle is not None}
