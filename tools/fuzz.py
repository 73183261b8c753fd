"""Randomized differential oracle harness (VERDICT r3 item 2).

The fixed 252-query registry and the driver share one blind spot: every
query in it was WRITTEN by the same author who wrote its oracle. This
harness attacks that: a seeded generator builds N random query ASTs over
the real fixture schemas (filters, group-bys, FK joins, windows, set ops,
EXISTS, ROLLUP, ORDER BY/LIMIT), renders each AST to ONE SQL string in the
Spark/DuckDB common subset, runs it through BOTH engines on the same
parquet, and diffs with the same order-insensitive comparator the
selfcheck/driver gate uses (tools.selfcheck.compare).

Determinism discipline (what keeps a mismatch a BUG, not noise):
  * no SUM/AVG over doubles (accumulation order varies) -- integer SUMs
    are exact in both engines once cast to BIGINT (DuckDB's HUGEINT
    otherwise decays to float in pandas);
  * ratio aggregates are emitted as FLOOR(1e6 * SUM/COUNT) -- both
    engines evaluate the identical scalar double expression, and FLOOR
    (unlike ROUND) has no tie-breaking semantics to disagree on
    (Spark rounds half-up, DuckDB half-even);
  * ORDER BY ... LIMIT only over a unique key; RANK/DENSE_RANK are
    tie-stable; ROW_NUMBER/frames always carry a unique-key tiebreak;
  * EXTRACT limited to YEAR/MONTH/DAY/HOUR (DOW numbering differs);
  * literals are sampled deterministically from the data via DuckDB, so
    predicates hit real selectivities instead of always-empty ranges.

Known engine divergence (recorded as known_divergence_rollup_empty, not a
failure): GROUP BY ROLLUP / CUBE / GROUPING SETS on an EMPTY input -- the
standard (DuckDB, Postgres) emits the grand-total grouping-set row with
COUNT 0; Spark's Expand-based multi-grain grouping yields zero rows. First
surfaced by seed=4 queries 66/169/su on the sf0.01 fixtures.

Template families (round-5 extended set): filter/project, group-by
(+HAVING/ROLLUP), FK joins (inner/left, 2- and 3-way), ranking windows,
set ops, ORDER/LIMIT(+OFFSET), EXISTS / IN / scalar subqueries, CTE,
CASE-bucketed group-by, NTILE/FIRST_VALUE/LAST_VALUE + RANGE frames
(PRECEDING/FOLLOWING/UNBOUNDED mixes), CUBE/GROUPING SETS with GROUPING()
flags, aggregate FILTER clauses, FULL OUTER self-joins, string-function
projections, DATE_TRUNC grains, INTERVAL arithmetic on timestamps,
DECIMAL casts + exact decimal aggregation, depth-2 correlated EXISTS down
the FK spine, and NULL-dense CTE fixtures (key-mod NULL injection probing
COUNT(col)/COALESCE/IS [NOT] DISTINCT FROM/FILTER-on-NULL).

Usage:
    python tools/fuzz.py [sf_dir] [--n 500] [--seed 4] [--json FUZZ_r4.json]

Exit nonzero on any mismatch; --json writes {seed, n, per-query verdicts}.
Also callable from tools/selfcheck.py via --fuzz N.
"""

from __future__ import annotations

import json
import random
import sys
import time
import traceback

import duckdb

sys.path.insert(0, "/root/repo")

from tools.selfcheck import compare  # same comparator as the driver gate

TABLES = (
    "region nation customer supplier part orders lineitem events documents"
).split()
# documents.text / events.props are huge or JSON -- never projected raw,
# only via LENGTH().
_NO_LITERAL = {("documents", "text"), ("events", "props")}
_UNIQUE_KEY = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
}
# (child, child_fk, parent, parent_pk)
_FKS = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

_KIND = {
    "INTEGER": "int",
    "BIGINT": "int",
    "DOUBLE": "float",
    "FLOAT": "float",
    "VARCHAR": "str",
    "TIMESTAMP": "ts",
    "TIMESTAMP_NS": "ts",
}


def _sql_str(v: str) -> str:
    return "'" + str(v).replace("'", "''") + "'"


def _lit(kind: str, v) -> str:
    if kind == "int":
        return str(int(v))
    if kind == "float":
        return repr(float(v))
    if kind == "str":
        return _sql_str(v)
    raise ValueError(kind)


class TableMeta:
    def __init__(self, name: str, cols: list[tuple[str, str]], samples):
        self.name = name
        self.cols = cols  # [(col, kind)]
        self.samples = samples  # col -> [literal values]

    def of_kind(self, *kinds: str) -> list[str]:
        return [c for c, k in self.cols if k in kinds]

    def kind(self, col: str) -> str:
        return dict(self.cols)[col]


def load_meta(sf_dir: str) -> dict[str, TableMeta]:
    con = duckdb.connect()
    metas: dict[str, TableMeta] = {}
    for t in TABLES:
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchall()
        cols = [
            (c, _KIND[d.upper()]) for c, d, *_ in desc if d.upper() in _KIND
        ]
        samples = {}
        for c, k in cols:
            if k == "ts" or (t, c) in _NO_LITERAL:
                continue
            vals = [
                r[0]
                for r in con.execute(
                    f"SELECT DISTINCT {c} FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet') "
                    f"WHERE {c} IS NOT NULL ORDER BY 1 LIMIT 201"
                ).fetchall()
            ]
            if vals:
                # spread picks: ends + quartiles of the observed range
                idx = sorted({0, len(vals) // 4, len(vals) // 2,
                              3 * len(vals) // 4, len(vals) - 1})
                samples[c] = [vals[i] for i in idx]
        metas[t] = TableMeta(t, cols, samples)
    con.close()
    return metas


# --------------------------------------------------------------------------
# generators (all draw ONLY from rng -- same seed => same query list)


def _pred(rng: random.Random, m: TableMeta, prefix: str = "") -> str:
    """One typed predicate over a sampled column."""
    cands = [
        (c, k)
        for c, k in m.cols
        if (c in m.samples or k == "ts") and (m.name, c) not in _NO_LITERAL
    ]
    c, k = rng.choice(cands)
    col = prefix + c
    if k == "ts":
        part = rng.choice(["YEAR", "MONTH", "DAY", "HOUR"])
        hi = {"YEAR": 2024, "MONTH": 12, "DAY": 28, "HOUR": 23}[part]
        lo = {"YEAR": 2020, "MONTH": 1, "DAY": 1, "HOUR": 0}[part]
        return (
            f"EXTRACT({part} FROM {col}) {rng.choice(['<', '>=', '='])} "
            f"{rng.randint(lo, hi)}"
        )
    vals = m.samples[c]
    form = rng.choice(
        ["cmp", "cmp", "between", "in", "null", "like"]
        if k == "str"
        else ["cmp", "cmp", "cmp", "between", "in", "null"]
    )
    if form == "cmp":
        op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
        return f"{col} {op} {_lit(k, rng.choice(vals))}"
    if form == "between":
        a, b = sorted(rng.sample(vals, 2) if len(vals) >= 2 else vals * 2)
        return f"{col} BETWEEN {_lit(k, a)} AND {_lit(k, b)}"
    if form == "in":
        picks = rng.sample(vals, min(len(vals), rng.randint(1, 3)))
        return f"{col} IN ({', '.join(_lit(k, v) for v in picks)})"
    if form == "null":
        return f"{col} IS {rng.choice(['NULL', 'NOT NULL'])}"
    # like: safe alnum fragment of a sampled string
    s = str(rng.choice(vals))
    frag = "".join(ch for ch in s if ch.isalnum())[:4]
    if not frag:
        return f"{col} IS NOT NULL"
    pat = rng.choice([f"{frag}%", f"%{frag}%", f"%{frag}"])
    return f"{col} LIKE {_sql_str(pat)}"


def _where(rng: random.Random, m: TableMeta, prefix: str = "") -> str:
    n = rng.randint(1, 3)
    parts = [_pred(rng, m, prefix) for _ in range(n)]
    if n == 1:
        p = parts[0]
        return f"NOT ({p})" if rng.random() < 0.15 else p
    op = rng.choice([" AND ", " OR "])
    return "(" + op.join(f"({p})" for p in parts) + ")"


def _scalar_proj(rng: random.Random, m: TableMeta, c: str, k: str,
                 alias: str, prefix: str = "") -> str:
    col = prefix + c
    if k == "int":
        e = rng.choice(
            [col, f"{col} + 7", f"{col} * 2", f"ABS({col} - 3)",
             f"GREATEST({col}, 5)", f"COALESCE({col}, -1)"]
        )
    elif k == "float":
        e = rng.choice([col, f"{col} * 2.0 + 1.0", f"ABS({col})",
                        f"LEAST({col}, 100.0)"])
    elif k == "str":
        e = rng.choice(
            [col, f"UPPER({col})", f"LOWER({col})", f"LENGTH({col})",
             f"SUBSTR({col}, 1, 4)",
             f"CASE WHEN {col} IS NULL THEN 'nil' ELSE 'val' END"]
        )
    else:  # ts
        part = rng.choice(["YEAR", "MONTH", "DAY", "HOUR"])
        e = f"EXTRACT({part} FROM {col})"
    return f"{e} AS {alias}"


def _proj_cols(rng: random.Random, m: TableMeta, prefix: str = "") -> list[str]:
    cands = [
        (c, k) for c, k in m.cols
        if (m.name, c) not in _NO_LITERAL
    ]
    picks = rng.sample(cands, min(len(cands), rng.randint(2, 4)))
    out = []
    for i, (c, k) in enumerate(picks):
        if k != "ts" and rng.random() < 0.5:
            out.append(f"{prefix}{c} AS c{i}")
        else:
            out.append(_scalar_proj(rng, m, c, k, f"c{i}", prefix))
    return out


def _aggs(rng: random.Random, m: TableMeta, prefix: str = "") -> list[str]:
    out = [f"CAST(COUNT(*) AS BIGINT) AS agg_cnt"]
    ints = m.of_kind("int")
    floats = m.of_kind("float")
    strs = [c for c in m.of_kind("str") if (m.name, c) not in _NO_LITERAL]
    n_extra = rng.randint(1, 3)
    for i in range(n_extra):
        choice = rng.choice(["cntd", "minmax", "isum", "ratio"])
        if choice == "cntd" and (ints or strs):
            c = prefix + rng.choice(ints + strs)
            out.append(f"CAST(COUNT(DISTINCT {c}) AS BIGINT) AS agg_d{i}")
        elif choice == "minmax" and (ints + floats + strs):
            c = prefix + rng.choice(ints + floats + strs)
            fn = rng.choice(["MIN", "MAX"])
            out.append(f"{fn}({c}) AS agg_m{i}")
        elif choice == "isum" and ints:
            c = prefix + rng.choice(ints)
            out.append(f"CAST(SUM({c}) AS BIGINT) AS agg_s{i}")
        elif ints:
            # order-independent AVG proxy: identical scalar double math in
            # both engines, FLOOR has no tie semantics (ROUND does)
            c = prefix + rng.choice(ints)
            out.append(
                f"CAST(FLOOR(1000000.0 * SUM({c}) / NULLIF(COUNT({c}), 0)) "
                f"AS BIGINT) AS agg_r{i}"
            )
    return out


def _group_cols(rng: random.Random, m: TableMeta, prefix: str = "") -> list[str]:
    cands = [
        c for c, k in m.cols
        if k == "str" and (m.name, c) not in _NO_LITERAL
    ]
    # low-cardinality ints too (flags, sizes, keys of tiny dims)
    cands += [c for c, k in m.cols if k == "int" and c in m.samples
              and len(m.samples[c]) <= 5]
    cands += [f"EXTRACT(YEAR FROM {c})" for c, k in m.cols if k == "ts"]
    if not cands:
        cands = [c for c, k in m.cols if k == "int"]
    picks = rng.sample(cands, min(len(cands), rng.randint(1, 2)))
    return [prefix + p if not p.startswith("EXTRACT") else p for p in picks]


# ---- templates -----------------------------------------------------------


def q_filter_project(rng, metas):
    m = metas[rng.choice(TABLES)]
    proj = _proj_cols(rng, m)
    sql = f"SELECT {', '.join(proj)} FROM {m.name} WHERE {_where(rng, m)}"
    if rng.random() < 0.2:
        sql = sql.replace("SELECT ", "SELECT DISTINCT ", 1)
    return sql


def q_groupby(rng, metas):
    m = metas[rng.choice(TABLES)]
    gcols = _group_cols(rng, m)
    galiases = [f"g{i}" for i in range(len(gcols))]
    gsel = [f"{c} AS {a}" for c, a in zip(gcols, galiases)]
    aggs = _aggs(rng, m)
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.7 else ""
    having = " HAVING COUNT(*) > 2" if rng.random() < 0.3 else ""
    rollup = rng.random() < 0.15 and not having
    group = (
        f"ROLLUP({', '.join(gcols)})" if rollup else ", ".join(gcols)
    )
    return (
        f"SELECT {', '.join(gsel + aggs)} FROM {m.name}{where} "
        f"GROUP BY {group}{having}"
    )


def q_join(rng, metas):
    child, fk, parent, pk = rng.choice(_FKS)
    cm, pm = metas[child], metas[parent]
    join_type = rng.choice(["JOIN", "JOIN", "JOIN", "LEFT JOIN"])
    on = f"c.{fk} = p.{pk}"
    where = f"({_where(rng, cm, 'c.')})"
    if join_type == "JOIN" and rng.random() < 0.6:
        where += f" AND ({_where(rng, pm, 'p.')})"
    if rng.random() < 0.5:
        gcols = _group_cols(rng, pm, "p.")
        gsel = [f"{c} AS g{i}" for i, c in enumerate(gcols)]
        aggs = _aggs(rng, cm, "c.")
        return (
            f"SELECT {', '.join(gsel + aggs)} FROM {child} c "
            f"{join_type} {parent} p ON {on} WHERE {where} "
            f"GROUP BY {', '.join(gcols)}"
        )
    cproj = _proj_cols(rng, cm, "c.")
    pproj = [
        p.replace(" AS c", " AS p") for p in _proj_cols(rng, pm, "p.")[:2]
    ]
    return (
        f"SELECT {', '.join(cproj + pproj)} FROM {child} c "
        f"{join_type} {parent} p ON {on} WHERE {where}"
    )


def q_window(rng, metas):
    t = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    m = metas[t]
    uniq = _UNIQUE_KEY[t]
    parts = _group_cols(rng, m)
    part = parts[0]
    ints = m.of_kind("int", "float")
    ord_col = rng.choice(ints) if ints else uniq
    desc = " DESC" if rng.random() < 0.5 else ""
    fn = rng.choice(["RANK()", "DENSE_RANK()", "ROW_NUMBER()"])
    # ROW_NUMBER needs a total order: unique-key tiebreak
    order = f"{ord_col}{desc}, {uniq}"
    w = f"PARTITION BY {part} ORDER BY {order}"
    sel = [f"{uniq} AS c0", f"{part} AS c1", f"{fn} OVER ({w}) AS rnk"]
    sints = m.of_kind("int")
    if sints and rng.random() < 0.6:
        s = rng.choice(sints)
        frame = rng.choice(
            ["ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
             "ROWS BETWEEN 2 PRECEDING AND CURRENT ROW"]
        )
        sel.append(
            f"CAST(SUM({s}) OVER (PARTITION BY {part} ORDER BY {uniq} "
            f"{frame}) AS BIGINT) AS run"
        )
    if rng.random() < 0.4:
        lagf = rng.choice(["LAG", "LEAD"])
        sel.append(
            f"{lagf}({ord_col}, 1) OVER (PARTITION BY {part} "
            f"ORDER BY {uniq}) AS lg"
        )
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.6 else ""
    return f"SELECT {', '.join(sel)} FROM {t}{where}"


def q_setop(rng, metas):
    m = metas[rng.choice(TABLES)]
    proj = _proj_cols(rng, m)
    op = rng.choice(["UNION", "UNION ALL", "INTERSECT", "EXCEPT"])
    p1, p2 = _where(rng, m), _where(rng, m)
    return (
        f"SELECT {', '.join(proj)} FROM {m.name} WHERE {p1} "
        f"{op} "
        f"SELECT {', '.join(proj)} FROM {m.name} WHERE {p2}"
    )


def q_order_limit(rng, metas):
    t = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    m = metas[t]
    uniq = _UNIQUE_KEY[t]
    proj = _proj_cols(rng, m)
    proj.append(f"{uniq} AS uk")
    desc = " DESC" if rng.random() < 0.5 else ""
    n = rng.choice([1, 5, 20, 100])
    return (
        f"SELECT {', '.join(proj)} FROM {t} WHERE {_where(rng, m)} "
        f"ORDER BY {uniq}{desc} LIMIT {n}"
    )


def q_exists(rng, metas):
    child, fk, parent, pk = rng.choice(_FKS)
    cm, pm = metas[child], metas[parent]
    neg = "NOT " if rng.random() < 0.3 else ""
    proj = _proj_cols(rng, cm, "c.")
    return (
        f"SELECT {', '.join(proj)} FROM {child} c "
        f"WHERE ({_where(rng, cm, 'c.')}) AND {neg}EXISTS "
        f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk} "
        f"AND ({_where(rng, pm, 'p.')}))"
    )


def q_cte(rng, metas):
    m = metas[rng.choice(TABLES)]
    gcols = _group_cols(rng, m)
    gsel = [f"{c} AS g{i}" for i, c in enumerate(gcols)]
    aggs = _aggs(rng, m)
    return (
        f"WITH base AS (SELECT * FROM {m.name} WHERE {_where(rng, m)}) "
        f"SELECT {', '.join(gsel + aggs)} FROM base "
        f"GROUP BY {', '.join(gcols)}"
    )


def q_in_subquery(rng, metas):
    child, fk, parent, pk = rng.choice(_FKS)
    cm, pm = metas[child], metas[parent]
    neg = "NOT " if rng.random() < 0.25 else ""
    proj = _proj_cols(rng, cm)
    return (
        f"SELECT {', '.join(proj)} FROM {child} "
        f"WHERE ({_where(rng, cm)}) AND {fk} {neg}IN "
        f"(SELECT {pk} FROM {parent} WHERE {_where(rng, pm)})"
    )


def q_scalar_subquery(rng, metas):
    m = metas[rng.choice(TABLES)]
    ints = [c for c in m.of_kind("int") if c in m.samples]
    if not ints:
        return q_filter_project(rng, metas)
    c = rng.choice(ints)
    fn = rng.choice(["MIN", "MAX"])
    op = rng.choice(["<", ">=", ">"])
    proj = _proj_cols(rng, m)
    return (
        f"SELECT {', '.join(proj)} FROM {m.name} "
        f"WHERE {c} {op} (SELECT {fn}({c}) FROM {m.name} "
        f"WHERE {_where(rng, m)})"
    )


def q_join3(rng, metas):
    # chained FK path: lineitem -> orders -> customer (the TPC-H spine)
    lm, om, cm = metas["lineitem"], metas["orders"], metas["customer"]
    gcols = _group_cols(rng, cm, "c.")
    gsel = [f"{c} AS g{i}" for i, c in enumerate(gcols)]
    aggs = _aggs(rng, lm, "l.")
    return (
        f"SELECT {', '.join(gsel + aggs)} "
        f"FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey "
        f"JOIN customer c ON o.o_custkey = c.c_custkey "
        f"WHERE ({_where(rng, lm, 'l.')}) AND ({_where(rng, om, 'o.')}) "
        f"GROUP BY {', '.join(gcols)}"
    )


def q_case_group(rng, metas):
    m = metas[rng.choice(TABLES)]
    ints = [c for c in m.of_kind("int") if c in m.samples]
    if not ints:
        return q_groupby(rng, metas)
    c = rng.choice(ints)
    pivot = rng.choice(m.samples[c])
    case = (
        f"CASE WHEN {c} < {int(pivot)} THEN 'lo' "
        f"WHEN {c} = {int(pivot)} THEN 'mid' ELSE 'hi' END"
    )
    aggs = _aggs(rng, m)
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.5 else ""
    return (
        f"SELECT {case} AS g0, {', '.join(aggs)} FROM {m.name}{where} "
        f"GROUP BY {case}"
    )


def q_window_frames(rng, metas):
    # NTILE / FIRST_VALUE / LAST_VALUE / RANGE frames -- all deterministic:
    # ranking orders by the unique key (total order); FIRST/LAST carry an
    # explicit full frame; the RANGE sum is over ints (ties included
    # value-wise, so partial order is fine).
    t = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    m = metas[t]
    uniq = _UNIQUE_KEY[t]
    part = _group_cols(rng, m)[0]
    ints = m.of_kind("int")
    strs = [c for c in m.of_kind("str") if (m.name, c) not in _NO_LITERAL]
    sel = [f"{uniq} AS c0", f"{part} AS c1",
           f"NTILE({rng.choice([2, 3, 4, 7])}) OVER "
           f"(PARTITION BY {part} ORDER BY {uniq}) AS nt"]
    if strs and rng.random() < 0.7:
        s = rng.choice(strs)
        fn = rng.choice(["FIRST_VALUE", "LAST_VALUE"])
        sel.append(
            f"{fn}({s}) OVER (PARTITION BY {part} ORDER BY {uniq} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) "
            f"AS fv"
        )
    if ints and rng.random() < 0.7:
        s, o = rng.choice(ints), rng.choice(ints)
        k = rng.choice([1, 2, 5])
        frame = rng.choice(
            [f"RANGE BETWEEN {k} PRECEDING AND CURRENT ROW",
             f"RANGE BETWEEN {k} PRECEDING AND {k} FOLLOWING",
             f"RANGE BETWEEN CURRENT ROW AND {k} FOLLOWING",
             "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"]
        )
        sel.append(
            f"CAST(SUM({s}) OVER (PARTITION BY {part} ORDER BY {o} "
            f"{frame}) AS BIGINT) AS rs"
        )
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.5 else ""
    return f"SELECT {', '.join(sel)} FROM {t}{where}"


def q_grouping_multi(rng, metas):
    # CUBE / GROUPING SETS with GROUPING() flags (the multi-grain surface
    # beyond plain ROLLUP that q_groupby already samples)
    m = metas[rng.choice(TABLES)]
    gcols = _group_cols(rng, m)
    if len(gcols) < 2:
        extra = [c for c, k in m.cols
                 if k == "int" and c not in gcols and c in m.samples]
        if extra:
            gcols.append(rng.choice(extra))
    gsel = [f"{c} AS g{i}" for i, c in enumerate(gcols)]
    flags = [f"CAST(GROUPING({c}) AS BIGINT) AS gf{i}"
             for i, c in enumerate(gcols)]
    aggs = _aggs(rng, m)
    if len(gcols) >= 2 and rng.random() < 0.5:
        group = (f"GROUPING SETS (({gcols[0]}, {gcols[1]}), "
                 f"({gcols[0]}), ())")
    else:
        group = f"CUBE({', '.join(gcols)})"
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.6 else ""
    return (
        f"SELECT {', '.join(gsel + flags + aggs)} FROM {m.name}{where} "
        f"GROUP BY {group}"
    )


def q_agg_filter(rng, metas):
    # aggregate FILTER (WHERE ...) clauses -- int-only accumulators
    m = metas[rng.choice(TABLES)]
    gcols = _group_cols(rng, m)
    gsel = [f"{c} AS g{i}" for i, c in enumerate(gcols)]
    ints = m.of_kind("int")
    aggs = [f"CAST(COUNT(*) AS BIGINT) AS agg_cnt",
            f"CAST(COUNT(*) FILTER (WHERE {_pred(rng, m)}) AS BIGINT) "
            f"AS agg_f0"]
    if ints:
        c = rng.choice(ints)
        aggs.append(
            f"CAST(SUM({c}) FILTER (WHERE {_pred(rng, m)}) AS BIGINT) "
            f"AS agg_f1"
        )
    return (
        f"SELECT {', '.join(gsel + aggs)} FROM {m.name} "
        f"GROUP BY {', '.join(gcols)}"
    )


def q_full_outer(rng, metas):
    # FULL OUTER self-join of two filtered subsets on the unique key
    t = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    m = metas[t]
    uniq = _UNIQUE_KEY[t]
    pa, pb = _where(rng, m), _where(rng, m)
    ints = m.of_kind("int")
    extra = f", b.{rng.choice(ints)} AS x0" if ints else ""
    return (
        f"SELECT a.{uniq} AS ka, b.{uniq} AS kb{extra} "
        f"FROM (SELECT * FROM {t} WHERE {pa}) a "
        f"FULL OUTER JOIN (SELECT * FROM {t} WHERE {pb}) b "
        f"ON a.{uniq} = b.{uniq}"
    )


def q_offset(rng, metas):
    t = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    m = metas[t]
    uniq = _UNIQUE_KEY[t]
    proj = _proj_cols(rng, m)
    proj.append(f"{uniq} AS uk")
    desc = " DESC" if rng.random() < 0.5 else ""
    n, off = rng.choice([1, 5, 20]), rng.choice([1, 3, 10, 50])
    return (
        f"SELECT {', '.join(proj)} FROM {t} WHERE {_where(rng, m)} "
        f"ORDER BY {uniq}{desc} LIMIT {n} OFFSET {off}"
    )


def q_string_fns(rng, metas):
    # string-function projections over a sampled string column
    m = metas[rng.choice(TABLES)]
    strs = [c for c in m.of_kind("str") if (m.name, c) not in _NO_LITERAL]
    if not strs:
        return q_filter_project(rng, metas)
    uniq = _UNIQUE_KEY.get(m.name)
    c = rng.choice(strs)
    exprs = rng.sample(
        [f"REPLACE({c}, 'a', '_') AS s0", f"LPAD({c}, 12, '.') AS s1",
         f"RPAD({c}, 12, '.') AS s2", f"REVERSE({c}) AS s3",
         f"CAST(POSITION('e' IN {c}) AS BIGINT) AS s4",
         f"LEFT({c}, 3) AS s5", f"RIGHT({c}, 2) AS s6",
         f"TRIM({c}) AS s7", f"CONCAT(UPPER({c}), '-', LOWER({c})) AS s8",
         f"SUBSTR({c}, 2, 5) AS s9"],
        rng.randint(2, 4),
    )
    key = [f"{uniq} AS uk"] if uniq else []
    return (
        f"SELECT {', '.join(key + exprs)} FROM {m.name} "
        f"WHERE {_where(rng, m)}"
    )


def q_date_trunc(rng, metas):
    # DATE_TRUNC grain group-by over a timestamp column
    cands = [(t, c) for t in TABLES for c, k in metas[t].cols if k == "ts"]
    if not cands:
        return q_groupby(rng, metas)
    t, c = rng.choice(cands)
    m = metas[t]
    grain = rng.choice(["month", "day", "week", "quarter", "hour"])
    aggs = _aggs(rng, m)
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.5 else ""
    return (
        f"SELECT DATE_TRUNC('{grain}', {c}) AS g0, "
        f"{', '.join(aggs)} FROM {t}{where} "
        f"GROUP BY DATE_TRUNC('{grain}', {c})"
    )




def q_window_median(rng, metas):
    # Holistic aggregate AS a window function (the win_percentile surface):
    # MEDIAN over a partition. Integer-valued inputs keep the
    # 0.5-interpolation an exact dyadic, so both engines agree bitwise.
    t = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    m = metas[t]
    uniq = _UNIQUE_KEY[t]
    ints = m.of_kind("int")
    if not ints:
        return q_window(rng, metas)
    part = _group_cols(rng, m)[0]
    c = rng.choice(ints)
    sel = [f"{uniq} AS c0", f"{part} AS c1",
           f"MEDIAN({c}) OVER (PARTITION BY {part}) AS med"]
    if rng.random() < 0.5:
        c2 = rng.choice(ints)
        sel.append(
            f"CAST(COUNT({c2}) OVER (PARTITION BY {part}) AS BIGINT) AS n"
        )
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.5 else ""
    return f"SELECT {', '.join(sel)} FROM {t}{where}"


def q_interval_arith(rng, metas):
    # INTERVAL arithmetic on timestamps (round-5 grammar): shifted
    # projections and interval-window predicates. `INTERVAL n UNIT` and
    # timestamp +/- interval parse identically in Spark SQL and DuckDB;
    # results are exact (integer-microsecond arithmetic, no floats).
    cands = [(t, c) for t in TABLES for c, k in metas[t].cols if k == "ts"]
    if not cands:
        return q_filter_project(rng, metas)
    t, c = rng.choice(cands)
    m = metas[t]
    uniq = _UNIQUE_KEY.get(m.name)
    n1, u1 = rng.randint(1, 72), rng.choice(["HOUR", "DAY", "MINUTE"])
    n2, u2 = rng.randint(1, 30), rng.choice(["DAY", "HOUR"])
    sel = ([f"{uniq} AS uk"] if uniq else []) + [
        f"CAST({c} + INTERVAL {n1} {u1} AS TIMESTAMP) AS t_plus",
        f"CAST({c} - INTERVAL {n2} {u2} AS TIMESTAMP) AS t_minus",
        f"CAST(DATE_TRUNC('day', {c} + INTERVAL {n1} {u1}) AS TIMESTAMP) "
        f"AS t_day",
    ]
    pred = rng.choice(
        [f"{c} + INTERVAL {n2} {u2} < TIMESTAMP '2024-06-01 00:00:00'",
         f"{c} >= TIMESTAMP '2024-01-01 00:00:00' - INTERVAL {n1} {u1}",
         f"DATE_TRUNC('month', {c}) = DATE_TRUNC('month', "
         f"{c} + INTERVAL {rng.randint(1, 20)} MINUTE)"]
    )
    where = f"({_where(rng, m)}) AND ({pred})"
    return f"SELECT {', '.join(sel)} FROM {t} WHERE {where}"


def q_decimal_cast(rng, metas):
    # DECIMAL casts + exact decimal aggregation (round-5 grammar; the
    # money-SUM discipline under fuzz): accumulate doubles as
    # DECIMAL(18,4) -- order-independent in both engines -- then cast
    # back to DOUBLE for the comparator. Also fuzzes scalar DECIMAL
    # rescale casts (ties impossible: *.x5 at scale 4 -> scale 2 only
    # from 2 true digits, sampled literals have <= 2).
    m = metas[rng.choice(TABLES)]
    floats = m.of_kind("float")
    ints = m.of_kind("int")
    if not floats:
        return q_groupby(rng, metas)
    c = rng.choice(floats)
    gcols = _group_cols(rng, m)
    gsel = [f"{g} AS g{i}" for i, g in enumerate(gcols)]
    scale = rng.choice([2, 4, 6])
    aggs = [
        "CAST(COUNT(*) AS BIGINT) AS agg_cnt",
        f"CAST(SUM(CAST({c} AS DECIMAL(18,{scale}))) AS DOUBLE) AS agg_dec",
        f"CAST(MIN(CAST({c} AS DECIMAL(18,{scale}))) AS DOUBLE) AS agg_lo",
    ]
    if ints and rng.random() < 0.5:
        i0 = rng.choice(ints)
        aggs.append(
            f"CAST(SUM(CAST({i0} AS DECIMAL(12,0))) AS BIGINT) AS agg_iD"
        )
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.6 else ""
    return (
        f"SELECT {', '.join(gsel + aggs)} FROM {m.name}{where} "
        f"GROUP BY {', '.join(gcols)}"
    )


def q_exists_depth2(rng, metas):
    # depth-2 correlated EXISTS down the FK spine (round-5 grammar):
    # customer -> orders -> lineitem, each level correlated to its parent
    # and independently filtered; random NOT at either level.
    cm, om, lm = metas["customer"], metas["orders"], metas["lineitem"]
    n1 = "NOT " if rng.random() < 0.3 else ""
    n2 = "NOT " if rng.random() < 0.3 else ""
    proj = _proj_cols(rng, cm, "c.")
    return (
        f"SELECT {', '.join(proj)} FROM customer c "
        f"WHERE ({_where(rng, cm, 'c.')}) AND {n1}EXISTS ("
        f"SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey "
        f"AND ({_where(rng, om, 'o.')}) AND {n2}EXISTS ("
        f"SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey "
        f"AND ({_where(rng, lm, 'l.')})))"
    )


def q_null_dense(rng, metas):
    # NULL-dense fixture via an inline CTE (round-5 grammar): key-mod
    # NULLIF injection makes ~1/k of every probed column NULL, then the
    # query exercises the NULL-sensitive surface -- COUNT(col) vs
    # COUNT(*), COALESCE buckets, IS NOT DISTINCT FROM, NULL-skipping
    # MIN/MAX -- where engines most often disagree.
    t = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    m = metas[t]
    uniq = _UNIQUE_KEY[t]
    ints = [c for c in m.of_kind("int") if c != uniq and c in m.samples]
    strs = [c for c in m.of_kind("str") if (m.name, c) not in _NO_LITERAL]
    if not ints or not strs:
        return q_groupby(rng, metas)
    ic, sc = rng.choice(ints), rng.choice(strs)
    k1, k2 = rng.choice([2, 3, 5]), rng.choice([3, 4, 7])
    cte = (
        f"WITH nd AS (SELECT {uniq} AS uk, "
        f"CASE WHEN {uniq} % {k1} = 0 THEN NULL ELSE {ic} END AS iv, "
        f"CASE WHEN {uniq} % {k2} = 0 THEN NULL ELSE {sc} END AS sv "
        f"FROM {t})"
    )
    form = rng.choice(["agg", "distinct_from", "coalesce_group"])
    if form == "agg":
        return (
            f"{cte} SELECT COALESCE(sv, '<null>') AS g0, "
            f"CAST(COUNT(*) AS BIGINT) AS agg_cnt, "
            f"CAST(COUNT(iv) AS BIGINT) AS agg_nn, "
            f"CAST(SUM(iv) AS BIGINT) AS agg_s, "
            f"MIN(iv) AS agg_lo, MAX(iv) AS agg_hi "
            f"FROM nd GROUP BY COALESCE(sv, '<null>')"
        )
    if form == "distinct_from":
        lit = rng.choice(m.samples[ic])
        neg = "NOT " if rng.random() < 0.5 else ""
        return (
            f"{cte} SELECT uk, iv FROM nd "
            f"WHERE iv IS {neg}DISTINCT FROM {int(lit)}"
        )
    return (
        f"{cte} SELECT CAST(uk % {k1} AS BIGINT) AS g0, "
        f"CAST(COUNT(*) FILTER (WHERE iv IS NULL AND sv IS NULL) AS BIGINT) "
        f"AS agg_bothnull, "
        f"CAST(COUNT(*) FILTER (WHERE iv IS NULL) AS BIGINT) AS agg_inull "
        f"FROM nd GROUP BY uk % {k1}"
    )


def q_window_mixed(rng, metas):
    # ROWS and RANGE frames MIXED in one query (round-5 verdict fuzzer
    # item): same relation, several window specs with different orderings
    # -- exercises Spark's window-exec grouping/ordering reuse against
    # DuckDB's. All deterministic: ROWS frames order by the unique key
    # (total order); the RANGE frame sums ints so value-ties are included
    # symmetrically in both engines.
    t = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    m = metas[t]
    uniq = _UNIQUE_KEY[t]
    part = _group_cols(rng, m)[0]
    ints = m.of_kind("int")
    if not ints:
        return q_window(rng, metas)
    s = rng.choice(ints)
    o = rng.choice(ints)
    k = rng.choice([1, 2, 5])
    rows_frame = rng.choice(
        ["ROWS BETWEEN 2 PRECEDING AND CURRENT ROW",
         "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW",
         "ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"]
    )
    range_frame = rng.choice(
        [f"RANGE BETWEEN {k} PRECEDING AND CURRENT ROW",
         f"RANGE BETWEEN {k} PRECEDING AND {k} FOLLOWING",
         "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"]
    )
    sel = [
        f"{uniq} AS c0",
        f"{part} AS c1",
        f"CAST(SUM({s}) OVER (PARTITION BY {part} ORDER BY {uniq} "
        f"{rows_frame}) AS BIGINT) AS rws",
        f"CAST(SUM({s}) OVER (PARTITION BY {part} ORDER BY {o} "
        f"{range_frame}) AS BIGINT) AS rng",
        f"ROW_NUMBER() OVER (PARTITION BY {part} ORDER BY {uniq}) AS rn",
    ]
    if rng.random() < 0.5:
        sel.append(
            f"CAST(COUNT(*) OVER (PARTITION BY {part} ORDER BY {o} "
            f"RANGE BETWEEN CURRENT ROW AND {k} FOLLOWING) AS BIGINT) AS cnt_fwd"
        )
    where = f" WHERE {_where(rng, m)}" if rng.random() < 0.5 else ""
    return f"SELECT {', '.join(sel)} FROM {t}{where}"


def q_anti_join(rng, metas):
    # Anti-join grammar beyond plain NOT EXISTS (round-5 verdict fuzzer
    # item): LEFT JOIN ... IS NULL, NOT EXISTS with a NON-EQUI residual on
    # the correlation, and the two-sided semi+anti mix. FK columns are
    # non-null in the fixtures, so NOT IN's three-valued trap can't make
    # the whole result silently empty -- both engines agree on standard
    # semantics either way.
    child, fk, parent, pk = rng.choice(_FKS)
    cm, pm = metas[child], metas[parent]
    shape = rng.random()
    if shape < 0.4:
        # anti via LEFT JOIN + IS NULL against a FILTERED parent
        proj = _proj_cols(rng, cm, "c.")
        return (
            f"SELECT {', '.join(proj)} FROM {child} c "
            f"LEFT JOIN (SELECT {pk} FROM {parent} "
            f"WHERE {_where(rng, pm)}) p ON c.{fk} = p.{pk} "
            f"WHERE p.{pk} IS NULL AND ({_where(rng, cm, 'c.')})"
        )
    if shape < 0.7:
        # NOT EXISTS with a non-equi residual on the correlation
        cints = [c for c in cm.of_kind("int") if c in cm.samples]
        pints = [c for c in pm.of_kind("int") if c in pm.samples]
        if not cints or not pints:
            return q_exists(rng, metas)
        ci, pi = rng.choice(cints), rng.choice(pints)
        op = rng.choice(["<", ">", "<="])
        proj = _proj_cols(rng, cm, "c.")
        return (
            f"SELECT {', '.join(proj)} FROM {child} c "
            f"WHERE ({_where(rng, cm, 'c.')}) AND NOT EXISTS "
            f"(SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk} "
            f"AND p.{pi} {op} c.{ci})"
        )
    # semi AND anti against two different filtered parent subsets
    proj = _proj_cols(rng, cm, "c.")
    return (
        f"SELECT {', '.join(proj)} FROM {child} c "
        f"WHERE EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk} "
        f"AND ({_where(rng, pm, 'p.')})) "
        f"AND NOT EXISTS (SELECT 1 FROM {parent} p2 WHERE p2.{pk} = c.{fk} "
        f"AND ({_where(rng, pm, 'p2.')}))"
    )


def q_asof_scalar(rng, metas):
    # As-of pattern (round-5 verdict fuzzer item) as portable SQL: for
    # each left row, the greatest right key <= the left key (backward
    # as-of), via a correlated scalar MAX -- Catalyst decorrelates it to
    # the aggregate-join plan, DuckDB runs it natively; results compare
    # exactly. The right side is restricted to the TINY dims (an
    # inequality correlation decorrelates to a non-equi join -- a large
    # right side makes the plan quadratic in BOTH engines; left is always
    # filtered for the same reason).
    t_left = rng.choice([x for x in TABLES if x in _UNIQUE_KEY])
    t_right = rng.choice([x for x in ("region", "nation", "supplier")
                          if x != t_left])
    lm, rm = metas[t_left], metas[t_right]
    lints = [c for c in lm.of_kind("int") if c in lm.samples]
    rints = [c for c in rm.of_kind("int") if c in rm.samples]
    if not lints or not rints:
        return q_scalar_subquery(rng, metas)
    lk, rk = rng.choice(lints), rng.choice(rints)
    uniq = _UNIQUE_KEY[t_left]
    return (
        f"SELECT {uniq} AS c0, {lk} AS c1, "
        f"(SELECT MAX({rk}) FROM {t_right} r WHERE r.{rk} <= {t_left}.{lk}) "
        f"AS asof_val FROM {t_left} WHERE {_where(rng, lm)}"
    )


_TEMPLATES = [
    (q_filter_project, 16),
    (q_groupby, 17),
    (q_join, 14),
    (q_window, 9),
    (q_setop, 6),
    (q_order_limit, 4),
    (q_exists, 5),
    (q_cte, 4),
    (q_in_subquery, 5),
    (q_scalar_subquery, 4),
    (q_join3, 2),
    (q_case_group, 2),
    (q_window_frames, 4),
    (q_grouping_multi, 3),
    (q_agg_filter, 3),
    (q_full_outer, 2),
    (q_offset, 2),
    (q_string_fns, 3),
    (q_date_trunc, 2),
    (q_window_median, 3),
    (q_interval_arith, 4),
    (q_decimal_cast, 4),
    (q_exists_depth2, 3),
    (q_null_dense, 4),
    (q_window_mixed, 4),
    (q_anti_join, 4),
    (q_asof_scalar, 3),
]


def gen_queries(seed: int, n: int, metas) -> list[str]:
    rng = random.Random(seed)
    fns = [f for f, w in _TEMPLATES for _ in range(w)]
    return [rng.choice(fns)(rng, metas) for _ in range(n)]


# --------------------------------------------------------------------------


def run_fuzz(sf_dir: str, n: int, seed: int, spark=None) -> dict:
    """Run n random queries through Spark SQL and DuckDB; return report."""
    metas = load_meta(sf_dir)
    queries = gen_queries(seed, n, metas)

    if spark is None:
        from hive_person_service_spark.session import get_spark

        spark = get_spark(app_name="fuzz")
        spark.sparkContext.setLogLevel("ERROR")
    from hive_person_service_spark.sources import load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    report = {"sf_dir": sf_dir, "seed": seed, "n": n, "queries": []}
    n_pass = n_fail = 0
    t_start = time.time()
    for i, sql in enumerate(queries):
        entry = {"i": i, "sql": sql}
        try:
            sdf = spark.sql(sql).toPandas()
        except Exception:
            entry["verdict"] = "spark_error"
            entry["err"] = traceback.format_exc(limit=2)
            n_fail += 1
            report["queries"].append(entry)
            print(f"FAIL [{i}] spark error\n  {sql}")
            continue
        try:
            ddf = con.execute(sql).df()
        except Exception:
            entry["verdict"] = "duck_error"
            entry["err"] = traceback.format_exc(limit=2)
            n_fail += 1
            report["queries"].append(entry)
            print(f"FAIL [{i}] duckdb error\n  {sql}")
            continue
        problems = compare(sdf, ddf)
        if (
            problems
            and any(g in sql for g in ("ROLLUP", "CUBE", "GROUPING SETS"))
            and len(sdf) == 0
            and len(ddf) == 1
        ):
            # Known engine divergence, NOT a bug in this repo: on an EMPTY
            # input, the SQL standard (and DuckDB/Postgres) still emit the
            # grand-total grouping-set row (COUNT 0), but Spark expands
            # ROLLUP via Expand + a non-global groupBy(grouping_id), which
            # yields zero rows when the input is empty (apache/spark
            # behavior through 4.x). Recorded, counted separately, never a
            # failure.
            entry["verdict"] = "known_divergence_rollup_empty"
            report["queries"].append(entry)
            n_known = report.get("known_divergence", 0) + 1
            report["known_divergence"] = n_known
            print(f"known [{i}] rollup-on-empty-input divergence (spark 0 "
                  f"rows, duck grand-total row)")
            continue
        if problems:
            entry["verdict"] = "mismatch"
            entry["problems"] = problems
            entry["spark_rows"] = len(sdf)
            entry["duck_rows"] = len(ddf)
            n_fail += 1
            print(f"FAIL [{i}] {problems}\n  {sql}")
        else:
            entry["verdict"] = "ok"
            entry["rows"] = len(sdf)
            n_pass += 1
            if (i + 1) % 50 == 0:
                print(f"  ... {i + 1}/{n} ok so far "
                      f"({time.time() - t_start:.0f}s)")
        report["queries"].append(entry)
    report["pass"] = n_pass
    report["fail"] = n_fail
    report["wall_sec"] = round(time.time() - t_start, 1)
    con.close()
    print(f"\nfuzz: {n_pass} pass, {n_fail} FAIL "
          f"(seed={seed}, {report['wall_sec']}s)")
    return report


def main() -> int:
    argv = list(sys.argv[1:])
    n, seed, json_out = 500, 4, None
    if "--n" in argv:
        i = argv.index("--n")
        n = int(argv[i + 1])
        del argv[i : i + 2]
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i : i + 2]
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    report = run_fuzz(sf_dir, n, seed)
    if json_out:
        slim = dict(report)
        # keep full SQL only for failures; passes keep (i, rows)
        slim["queries"] = [
            q if q["verdict"] != "ok" else {"i": q["i"], "rows": q["rows"],
                                            "verdict": "ok"}
            for q in report["queries"]
        ]
        with open(json_out, "w") as f:
            json.dump(slim, f, indent=1)
        print(f"wrote {json_out}")
    return 1 if report["fail"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
