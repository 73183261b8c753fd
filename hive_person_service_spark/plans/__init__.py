"""Declared query inventory (SURVEY.md §2).

Importing this package populates the registry: each submodule declares its
query family with the ``@declare`` decorator (Spark DataFrame builder +
matching DuckDB oracle SQL).
"""

from .registry import REGISTRY, all_queries, all_oracles, declare  # noqa: F401

# Import order mirrors SURVEY.md §7's build plan; each import registers its
# family's queries.
from . import relational  # noqa: F401,E402  (§2.A/B scan/filter/project)
from . import joins  # noqa: F401,E402  (§2.C)
from . import aggregates  # noqa: F401,E402  (§2.D)
from . import windows  # noqa: F401,E402  (§2.E)
from . import sorts_sets  # noqa: F401,E402  (§2.F/G)
from . import scalar_fns  # noqa: F401,E402  (§2.H)
from . import events_stream  # noqa: F401,E402  (§2.I batch-equivalents)
from . import text_pipeline  # noqa: F401,E402  (§2.J dedup + text analysis)
from . import vector_pipeline  # noqa: F401,E402  (§2.J similarity search)
from . import udfs  # noqa: F401,E402  (§2.K)
from . import sql_surface  # noqa: F401,E402  (§3.1 SQL entry + subqueries)
from . import extras  # noqa: F401,E402  (pivot, null-safe join, long tail)
from . import extras2  # noqa: F401,E402  (structs, bitwise, try, tpch-style)
from . import arrays  # noqa: F401,E402  (explode_outer, higher-order, sequence)
from . import analytics  # noqa: F401,E402  (funnel, retention composites)
from . import tpch_more  # noqa: F401,E402  (Q5/Q10/Q13/Q18/Q22 analogs)
from . import extras3  # noqa: F401,E402  (mode/median, histogram, sessionize, fuzzy dedup)
from . import tpch_final  # noqa: F401,E402  (Q2/Q12/Q15/Q17/Q19 analogs)
from . import pipeline2  # noqa: F401,E402  (chunking, stratified sample, inverted index, anomaly)
from . import extras4  # noqa: F401,E402  (LATERAL top-k, time-interval RANGE frame)
from . import tpch_rest  # noqa: F401,E402  (Q4/Q9/Q11/Q16/Q20/Q21 analogs)
from . import pipeline3  # noqa: F401,E402  (PII scrub, mixture, repetition, blob dims)
from . import sketches  # noqa: F401,E402  (deterministic CMS + KMV sketches)
from . import extras5  # noqa: F401,E402  (streaks, winsorize, time-decay, EWMA)
from . import pipeline4  # noqa: F401,E402  (batch-query ANN, fused corpus signals)
from . import pipeline5  # noqa: F401,E402  (Gopher rules, line dedup, URL blocklist)
from . import vector_pipeline2  # noqa: F401,E402  (kmeans assign, SemDeDup, int8 quant)
from . import extras6  # noqa: F401,E402  (regression aggregates)
from . import analytics2  # noqa: F401,E402  (interleave, entropy, interarrival, cohorts)
from . import pipeline6  # noqa: F401,E402  (WAV meta, frame sampling, BPE encode)
from . import pipeline7  # noqa: F401,E402  (URL canonicalization, grouped reservoir)
from . import analytics3  # noqa: F401,E402  (PMI, Zipf fit, Markov, attribution)
