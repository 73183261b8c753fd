"""Round-11 regression pins.

1. No-forced-corpus-broadcast invariant: no ``F.broadcast`` hint may wrap a
   relation derived from an exploded-token groupBy (bigram/unigram LM models,
   document-frequency vocabularies, boilerplate-line sets, per-entity
   aggregates).  Those relations grow with the corpus, and a *forced*
   broadcast hint turns a planner choice into a guaranteed OOM at 100 TB.
   Bounded broadcasts (1-row global aggregates, label x dim centroids,
   fixed-size sketches, query-token-filtered relations) are allowlisted
   with the reason each is bounded.
"""
from __future__ import annotations

import re

import pytest

from tests.conftest import SF_SMALL

TREE = re.compile(r"^[\s:+|-]*")

# Broadcast hints that are genuinely bounded, by query name -> reason.
BOUNDED_BROADCASTS = {
    # centroid relation is |labels| x |dims| rows -- fixed by schema, not corpus
    "emb_centroid_distance": "label x dim centroid matrix",
    "emb_label_outliers": "label x dim centroid matrix",
    # CMS table is seeds x width cells -- a fixed-size sketch
    "sketch_cms_freq": "fixed-size count-min sketch",
    # df relation is pre-filtered to the query's token set -- bounded by the query
    "text_bm25_search": "df filtered to query tokens",
}

# Corpus-facing query prefixes the invariant sweeps (plan-analysis only --
# building these queries has no side effects, unlike stream_*/table_*).
SWEEP_PREFIXES = ("text_", "dedup_", "sim_", "emb_", "sketch_", "geo_", "quality_")


def _depth(line: str) -> int:
    return len(TREE.match(line).group(0))


def _hint_subtrees(plan: str):
    """Yield (child_line, subtree_text) for each broadcast ResolvedHint."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "ResolvedHint" in ln and "broadcast" in ln:
            d = _depth(ln)
            j = i + 1
            sub = []
            while j < len(lines) and _depth(lines[j]) > d:
                sub.append(lines[j])
                j += 1
            yield (lines[i + 1] if i + 1 < len(lines) else "", "\n".join(sub))


def _is_global_agg(child: str) -> bool:
    body = child.strip().lstrip(":+|- ")
    return body.startswith("Aggregate [") and "], [" not in body


def _forced_corpus_broadcasts(plan: str) -> list[str]:
    bad = []
    for child, sub in _hint_subtrees(plan):
        has_explode = "Generate explode" in sub or "Generate posexplode" in sub
        grouped_agg = "], [" in sub and "Aggregate [" in sub
        if has_explode and grouped_agg and not _is_global_agg(child):
            bad.append(child.strip())
    return bad


def test_no_forced_broadcast_of_corpus_relations(spark):
    from hive_person_service_spark import plans

    qs = plans.all_queries()
    swept, offenders = 0, {}
    for name in sorted(qs):
        if not name.startswith(SWEEP_PREFIXES):
            continue
        df = qs[name](spark, SF_SMALL)
        plan = df._jdf.queryExecution().analyzed().toString()
        bad = _forced_corpus_broadcasts(plan)
        if bad and name not in BOUNDED_BROADCASTS:
            offenders[name] = bad
        swept += 1
    assert swept >= 60, f"sweep shrank unexpectedly: only {swept} queries"
    assert not offenders, (
        "forced broadcast of a corpus-derived (explode->groupBy) relation -- "
        f"a planner choice became a guaranteed 100TB OOM: {offenders}"
    )


@pytest.mark.parametrize(
    "qname",
    ["text_lm_score", "text_tfidf", "text_keywords", "text_collocations_pmi",
     "text_line_dedup", "geo_grid_join"],
)
def test_unhinted_queries_have_no_model_broadcast_hint(spark, qname):
    """The six round-11 de-hinted queries carry at most 1-row-aggregate hints."""
    from hive_person_service_spark import plans

    df = plans.all_queries()[qname](spark, SF_SMALL)
    plan = df._jdf.queryExecution().analyzed().toString()
    for child, _sub in _hint_subtrees(plan):
        assert _is_global_agg(child), (
            f"{qname}: broadcast hint on a non-global-aggregate relation: "
            f"{child.strip()}"
        )
