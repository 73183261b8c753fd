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
from . import analytics4  # noqa: F401,E402  (Q8, centroid cosine, paths, keywords, containment, curriculum)
from . import pipeline8  # noqa: F401,E402  (winnowing, simhash band pairs, weighted median, importance sample, shard manifest)
from . import pipeline9  # noqa: F401,E402  (substring spans, token budget, BPE pair stats, rate spikes)
from . import pipeline10  # noqa: F401,E402  (lang confusion, KS drift, nearest as-of)
from . import pipeline11  # noqa: F401,E402  (TWAP, chi-square, power-iteration PCA)
from . import pipeline12  # noqa: F401,E402  (SQL-registered UDF, step latency, keep-best dedup, Pareto)
from . import pipeline13  # noqa: F401,E402  (vocab coverage, epoch shuffle, backlog aging)
from . import pipeline14  # noqa: F401,E402  (grouping_id, JS divergence, audio RMS, compression ratio)
from . import pipeline15  # noqa: F401,E402  (RFM segments, error-budget burn)
from . import streaming_live  # noqa: F401,E402  (true-streaming tumbling, custom Python DataSource)
from . import pipeline16  # noqa: F401,E402  (bucketed range join, Holt forecast)
from . import pipeline17  # noqa: F401,E402  (mergeable KMV lifecycle, seasonal anomaly)
from . import pipeline18  # noqa: F401,E402  (ngram novelty, seasonality index, supplier HHI, burstiness)
from . import pipeline19  # noqa: F401,E402  (dedup impact report, power users)
from . import pipeline20  # noqa: F401,E402  (bot detection, template families, YoY customer flows)
from . import pipeline21  # noqa: F401,E402  (cohort LTV, embedding norm audit)
from . import pipeline22  # noqa: F401,E402  (PII redaction, unigram logprob, repetition ratio)
from . import partitioned  # noqa: F401,E402  (date-partitioned layout + pruned scan)
from . import pipeline23  # noqa: F401,E402  (declared ORC/CSV format round-trips)
from . import pipeline24  # noqa: F401,E402  (record linkage, privacy, geo NN, incremental MV, schema evolution)
from . import pipeline25  # noqa: F401,E402  (variant JSON, pipe SQL, time travel, interpolation)
from . import pipeline26  # noqa: F401,E402  (snapshot change-data-feed read)
from . import pipeline27  # noqa: F401,E402  (bitmap/HLL distinct state, LOCF, pagination, GROUP BY ALL)
from . import pipeline28  # noqa: F401,E402  (2-D Z-order pruned scan, market-basket rules)
from . import pipeline29  # noqa: F401,E402  (cogrouped pandas, triangle motifs, collations)
from . import pipeline30  # noqa: F401,E402  (Python DataSource writer round-trip)
from . import pipeline31  # noqa: F401,E402  (matryoshka + sign-bit retrieval tiers)
from . import pipeline32  # noqa: F401,E402  (window percentile, match_recognize, bloom prefilter, observe, compaction, A-ES sampling, l-diversity, polymorphic UDTF)
from . import pipeline33  # noqa: F401,E402  (theta-sketch intersection, SQL UDF/TVF, parameterized SQL, A/B z-test, Kaplan-Meier, pixel stats, bigram LM)
from . import pipeline34  # noqa: F401,E402  (script TRANSFORM, SCD2 point-in-time join, column masking, CUSUM, skyline, snapshot rollback, audio spectral)
from . import pipeline35  # noqa: F401,E402  (parse_url, map algebra, XML ingest, native HLL sketches, composed dedup cascade)
from . import pipeline36  # noqa: F401,E402  (BPE merge training, ACID DELETE/UPDATE, JL projection, star-except)
from . import pipeline37  # noqa: F401,E402  (DQ expectations gate, image retrieval plumbing, HLL sliding WAU)
from . import pipeline38  # noqa: F401,E402  (pandas-on-Spark API, crosstab)
from . import pipeline39  # noqa: F401,E402  (CUPED experiment analysis, embedding drift monitor)
from . import pipeline40  # noqa: F401,E402  (grid-bucketed spatial join, video scene cuts)
from . import pipeline41  # noqa: F401,E402  (declarative alert rules, readability scoring, CACHE TABLE)
from . import pipeline42  # noqa: F401,E402  (streaming alerting, CSV quarantine ingest, AES column crypto)
from . import pipeline43  # noqa: F401,E402  (BM25 ranked retrieval, logistic batch scoring)
from . import pipeline44  # noqa: F401,E402  (Avro OCF round-trip, JDBC federation)
from . import pipeline45  # noqa: F401,E402  (BFS shortest path, k-anonymity, DP release, co-occurrence reco, rolling median, JW entity resolution)
from . import pipeline46  # noqa: F401,E402  (exactly-once Delta streaming ingest; Iceberg partitioned scan + manifest pruning, stats skipping both formats, Delta MERGE, schema evolution, timestamp travel)
from . import pipeline47  # noqa: F401,E402  (transformWithStateInPandas executed end-to-end: ValueState + MapState on RocksDB through the vendored protobuf wire shim)
from . import pipeline48  # noqa: F401,E402  (Iceberg v3 deletion vectors in Puffin files; UniForm + CONVERT TO DELTA; Delta V2 checkpoints + shallow clone; tws sessionization)
from . import pipeline49  # noqa: F401,E402  (temperature-scaled mixture allocation)
from . import pipeline50  # noqa: F401,E402  (Apache Hudi interop: CoW snapshot/time-travel/incremental, MOR log-merge snapshot + read-optimized tier)
from . import pipeline51  # noqa: F401,E402  (ML training: closed-form OLS with a Cramer-rule SQL oracle; full-batch-GD logistic quality classifier)
from . import pipeline52  # noqa: F401,E402  (k-core peel with an unrolled-CTE oracle)
from . import pipeline53  # noqa: F401,E402  (ALS matrix factorization with an unrolled-CTE oracle)
from . import pipeline54  # noqa: F401,E402  (connected components, Gaussian naive Bayes)
from . import pipeline55  # noqa: F401,E402  (boosted stumps, rank-2 ALS, Kneser-Ney LM)
from . import pipeline56  # noqa: F401,E402  (cross-format storage-maintenance lifecycle)
from . import pipeline57  # noqa: F401,E402  (t-closeness, Mann-Whitney U, daily-series ACF)
from . import pipeline58  # noqa: F401,E402  (lake metadata/history as queryable relations)
from . import pipeline59  # noqa: F401,E402  (Hudi column-stats data skipping; Hive ACID tables)
from . import pipeline60  # noqa: F401,E402  (WordPiece training, decontamination report, depth-2 GBT)
from . import pipeline61  # noqa: F401,E402  (Hive ACID: partitioned, original files, insert-only MM; Delta CDF files)
from . import pipeline62  # noqa: F401,E402  (Iceberg files/partitions metadata tables)

# The driver certifies a bounded prefix of this registry (round 1: exactly
# the first 50 entries), so insertion order is evidence policy, not style.
# Reorder so that prefix carries one representative per SURVEY.md §2 family
# -- A scans, B-G relational, H fn families (string/datetime/math/cond/
# array/map/JSON/hash), I streaming batch-equivalents, J LLM-pipeline
# (dedup/similarity/text/multimodal), K UDF/UDAF/UDTF -- instead of being
# 100% relational. Redundant same-family variants (extra filter shapes,
# set-op ALLs, TPC-H analogs) sort after the prefix; they keep their
# round-1 driver greens and stay covered by selfcheck/pytest.
#
# CERT-ROTATION POLICY (fixed-size window, explicit sign-off per ADVICE
# r7): each round's showcases may DISPLACE a same-family variant whose
# family stays driver-covered by another prefix entry.  Rotated out so
# far -- agg_approx_distinct (r5, rows-only by design), agg_grouping_sets
# (r7, family covered by agg_rollup), win_topk_per_group (r7, family
# covered by win_rank), stream_sliding (r6, family covered by
# stream_tumbling); round 8 rotates out join_range (family covered by
# join_inner/broadcast/left/semi/anti/asof) for table_multi_format_join
# (Delta x Iceberg x Hudi in one plan), win_lag_lead (family covered by
# win_rank + win_running_sum) for ml_train_als (oracle-checked
# alternating fit), and stream_dedup_events (dedup family covered by
# dedup_exact/dedup_near) for stream_delta_tail (the partitioned
# DataSourceStreamReader tail).  The round-8 continuation rotates
# set_except (set family covered by set_union_all) for ml_train_gbt
# (hash-checked gradient-boosted stump training) and fn_conditional
# (CASE/WHEN covered by proj_case_when) for table_lake_maintenance
# (the three-format OPTIMIZE+retention lifecycle with self-certifying
# reclamation).  Round 9 rotates dedup_ngram_jaccard (dedup family
# covered by dedup_exact + dedup_near) for dedup_decontaminate (the
# train-vs-holdout 13-gram contamination report with in-query
# injection) and ml_train_ols (closed-form fit; the ML-training family
# stays covered by ml_train_als + ml_train_gbt) for table_hive_acid_scan
# (the reference's OWN transactional format: base/delta/delete_delta
# ROW__ID merge through executor-side ORC decode).  Round 10 rotates
# fn_map (map functions stay driver-covered by fn_array_explode +
# fn_json_props, both complex-type fn entries) for
# table_hive_acid_partition_pruned (partitioned ACID directories with
# driver-side pruning + cross-partition delete-delta merge) and
# agg_stats (moment aggregates stay covered by agg_percentile +
# agg_groupby) for table_delta_cdf_files (the CDF protocol's cdc
# actions + _change_data files preferred over log reconstruction).
# Every displaced query stays DECLARED, selfchecked at all three SFs,
# and pytest-covered; displacement changes which queries land in the
# driver's 50-query sample, nothing else.
_CERT_PRIORITY = [
    # A: scan + project (parquet pushdown)
    "scan_project",
    # B: filter / project / distinct
    "filter_pred", "proj_case_when", "filter_null", "distinct_rows",
    # C: joins
    "join_inner", "join_broadcast", "join_left_outer", "join_semi",
    "join_anti", "table_multi_format_join", "join_asof",
    # A (r5): Avro landing-zone round-trip (oracle-checked source row
    # in place of rows-only agg_approx_distinct, which stays declared)
    "source_avro_roundtrip",
    # D: aggregates (r7: agg_grouping_sets' slot showcases the Hudi
    # MERGE_ON_READ snapshot -- base parquet + HoodieLogFormat log
    # blocks merged per record key, the round's most involved read
    # path; multi-grain aggregation stays driver-covered by agg_rollup,
    # and agg_grouping_sets stays declared + selfchecked)
    "agg_groupby", "agg_count_distinct",
    "agg_rollup", "table_hudi_mor_read", "agg_percentile",
    "table_delta_cdf_files",
    # E: windows (r7: win_topk_per_group's slot showcases ml_train_ols,
    # the oracle-checked distributed MODEL FIT -- the ranking machinery
    # stays driver-covered by win_rank, and win_topk_per_group stays
    # declared + selfchecked)
    "win_rank", "ml_train_als", "win_running_sum", "table_hive_acid_scan",
    # F: sort / limit
    "sort_global", "sort_limit_topk",
    # G: set ops (set_except's slot showcases ml_train_gbt -- the
    # hash-checked boosted-stump trainer; set semantics stay covered
    # by set_union_all)
    "set_union_all", "ml_train_gbt",
    # H: scalar fn families (fn_conditional's slot showcases the
    # cross-format maintenance lifecycle; CASE/WHEN stays covered by
    # proj_case_when)
    "fn_string", "fn_datetime", "fn_math", "table_lake_maintenance",
    "fn_array_explode", "table_hive_acid_partition_pruned",
    "fn_json_props", "fn_hash",
    # I: event-time windows + stateful dedup (batch equivalents) + the
    # r6 flagship: transformWithStateInPandas EXECUTED through the
    # vendored protobuf wire shim (stream_sliding's slot; the window
    # family stays covered by stream_tumbling, and stream_sliding stays
    # declared + selfchecked)
    # stream_session's slot upgrades to the r6 ListState sessionizer
    # (same semantics family, ORACLE-CHECKED arbitrary-stateful streaming,
    # exact under out-of-order batches; stream_session stays declared +
    # selfchecked)
    "stream_tumbling", "stream_tws_totals", "stream_tws_sessions",
    "stream_delta_tail",
    # J: LLM-data-pipeline surface (text_term_freq's slot now showcases
    # the r6 lake-planning tier -- text_tfidf subsumes term-freq math)
    "dedup_exact", "dedup_near", "dedup_decontaminate",
    "sim_topk", "sim_knn_join", "table_iceberg_partitioned_scan",
    "text_tfidf", "multimodal_blob",
    # K: Python extension points
    "udf_scalar", "udaf_grouped", "udtf_python",
]
assert len(_CERT_PRIORITY) == 50


def _reorder_for_certification() -> None:
    missing = [n for n in _CERT_PRIORITY if n not in REGISTRY]
    if missing:  # fail loudly at import: a rename must update this list
        raise KeyError(f"_CERT_PRIORITY names not in REGISTRY: {missing}")
    head = set(_CERT_PRIORITY)
    tail = [n for n in REGISTRY if n not in head]
    ordered = {n: REGISTRY[n] for n in [*_CERT_PRIORITY, *tail]}
    REGISTRY.clear()
    REGISTRY.update(ordered)


_reorder_for_certification()
