"""IVF ANN recall + maintenance operators (merge-upsert, compaction)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

from hive_person_service_spark.operators.ivf import build_ivf, ivf_topk
from hive_person_service_spark.operators.maintenance import (
    compact_parquet,
    merge_upsert,
)
from hive_person_service_spark.sources import load_table


def test_ivf_recall_vs_exact(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    assigned, centroids = build_ivf(emb, nlist=16, seed=42)
    assert assigned.select("cell").distinct().count() <= 16
    qv = np.array(
        emb.where(F.col("vec_id") == 0).collect()[0].embedding, dtype=np.float64
    )
    # Fixture embeddings are near-uniform on the sphere (measured intra-label
    # cos ~0.02): the worst case for any cell-probing index, so recall needs
    # nprobe=8 of 16 here; real clustered corpora reach the same recall at
    # much lower nprobe.
    got = {r.vec_id for r in ivf_topk(assigned.where(F.col("vec_id") != 0),
                                      centroids, qv, k=10, nprobe=8).collect()}
    from hive_person_service_spark import plans

    exact = {r.vec_id for r in plans.all_queries()["sim_topk"](spark, SF_SMALL).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.6, f"IVF recall@10 too low: {recall} ({got} vs {exact})"
    # full probe == exact
    full = {r.vec_id for r in ivf_topk(assigned.where(F.col("vec_id") != 0),
                                       centroids, qv, k=10, nprobe=16).collect()}
    assert full == exact


def test_ivf_knn_join_fullprobe_equals_exact_and_no_bnlj(spark):
    """The declared sim_knn_join tier: at nprobe == nlist the IVF kNN join
    must equal the brute-force kNN join exactly, and its plan must contain
    no BroadcastNestedLoopJoin (candidates meet via the cell equi-join)."""
    from hive_person_service_spark.operators.ivf import ivf_knn_join
    from hive_person_service_spark.operators.similarity import knn_join_exact

    emb = load_table(spark, SF_SMALL, "embeddings")
    assigned, centroids = build_ivf(emb, nlist=16, seed=42)
    anchors = emb.where(F.col("vec_id") < 20)

    ivf = ivf_knn_join(anchors, assigned, centroids, k=3, nprobe=16)
    plan = ivf._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan

    got = {(r.a_id, r.b_id, r.neighbor_rank) for r in ivf.collect()}
    want = {
        (r.a_id, r.b_id, r.neighbor_rank)
        for r in knn_join_exact(anchors, emb, k=3).collect()
    }
    assert got == want

    # Approximate setting: per-anchor neighbor recall stays useful even on
    # this near-uniform-sphere fixture (worst case for cell probing).
    approx = {
        (r.a_id, r.b_id)
        for r in ivf_knn_join(anchors, assigned, centroids, k=3, nprobe=8).collect()
    }
    exact_pairs = {(a, b) for a, b, _ in want}
    recall = len(approx & exact_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"IVF kNN-join recall too low: {recall}"


def test_ivf_persisted_index_prunes_partitions(spark, tmp_path):
    from hive_person_service_spark.operators.ivf import (
        read_ivf_index,
        write_ivf_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    root = str(tmp_path / "ivf")
    write_ivf_index(emb, root, nlist=16)
    vectors, centroids = read_ivf_index(spark, root)
    assert vectors.count() == emb.count()

    qv = np.array(
        emb.where(F.col("vec_id") == 0).collect()[0].embedding, dtype=np.float64
    )
    probe = ivf_topk(vectors.where(F.col("vec_id") != 0), centroids, qv,
                     k=10, nprobe=4)
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    # the cell IN-list must prune at the directory level
    assert "PartitionFilters: [cell" in plan.replace("isnotnull(cell#", "x"), plan

    # persisted probe == in-memory probe (same cells, same scores)
    assigned, cent2 = build_ivf(emb, nlist=16)
    mem = ivf_topk(assigned.where(F.col("vec_id") != 0), cent2, qv, k=10, nprobe=4)
    assert [tuple(r) for r in probe.collect()] == [tuple(r) for r in mem.collect()]


def test_ivf_incremental_add_delete(spark, tmp_path):
    """Incremental index maintenance on the persisted layout (VERDICT r4
    item 5): add a vector batch (append-only, no re-clustering), delete a
    batch (only affected cell partitions rewritten -- untouched cells keep
    their files byte-identical), then re-pin full-probe exactness and the
    nprobe recall floor against brute force over the UPDATED corpus."""
    import os

    from hive_person_service_spark.operators.ivf import (
        ivf_add_vectors,
        ivf_delete_vectors,
        read_ivf_index,
        write_ivf_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    n0 = emb.count()
    # hold out the last 50 vectors as the "nightly ingest" batch
    base = emb.where(F.col("vec_id") < n0 - 50)
    incoming = emb.where(F.col("vec_id") >= n0 - 50)
    root = str(tmp_path / "ivf_inc")
    write_ivf_index(base, root, nlist=16)

    def cell_state():
        out = {}
        vdir = os.path.join(root, "vectors")
        for d in sorted(os.listdir(vdir)):
            if d.startswith("cell="):
                files = sorted(os.listdir(os.path.join(vdir, d)))
                out[d] = [
                    (f, os.path.getmtime(os.path.join(vdir, d, f)))
                    for f in files
                    if f.endswith(".parquet")
                ]
        return out

    before_add = cell_state()
    added = ivf_add_vectors(spark, root, incoming)
    assert added == 50
    after_add = cell_state()
    # append-only: every pre-existing file survives untouched
    for d, files in before_add.items():
        assert set(files) <= set(after_add[d]), f"add rewrote {d}"
    vectors, centroids = read_ivf_index(spark, root)
    assert vectors.count() == n0

    # delete a handful of ids; find one untouched cell to pin
    victim_ids = [r.vec_id for r in vectors.limit(500).collect()][:5]
    victim_cells = {
        r.cell
        for r in vectors.where(F.col("vec_id").isin(victim_ids))
        .select("cell")
        .distinct()
        .collect()
    }
    deleted = ivf_delete_vectors(spark, root, victim_ids)
    assert deleted == 5
    after_del = cell_state()
    for d, files in after_add.items():
        cell_id = int(d.split("=")[1])
        if cell_id not in victim_cells:
            assert after_del[d] == files, f"delete rewrote untouched {d}"
        else:
            assert after_del[d] != files, f"delete left affected {d} as-is"

    vectors, centroids = read_ivf_index(spark, root)
    assert vectors.count() == n0 - 5
    assert vectors.where(F.col("vec_id").isin(victim_ids)).count() == 0

    # correctness on the UPDATED index: full probe == brute force; and the
    # recall floor holds at nprobe=8 (same floor as the static-index pin)
    import numpy as np

    qv = np.array(
        emb.where(F.col("vec_id") == 1).collect()[0].embedding, dtype=np.float64
    )
    corpus = {r.vec_id for r in vectors.select("vec_id").collect()}
    rows = emb.where(
        F.col("vec_id").isin([int(c) for c in corpus]) & (F.col("vec_id") != 1)
    ).collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    cos = (mat @ qv) / (
        np.linalg.norm(mat, axis=1) * np.linalg.norm(qv) + 1e-12
    )
    exact = set(ids[np.argsort(-cos)[:10]].tolist())
    full = {
        r.vec_id
        for r in ivf_topk(
            vectors.where(F.col("vec_id") != 1), centroids, qv, k=10, nprobe=16
        ).collect()
    }
    assert full == exact
    probe = {
        r.vec_id
        for r in ivf_topk(
            vectors.where(F.col("vec_id") != 1), centroids, qv, k=10, nprobe=8
        ).collect()
    }
    assert len(probe & exact) / 10 >= 0.6


def test_merge_upsert(spark, tmp_path):
    target = str(tmp_path / "t")
    base = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], "id long, s string, v double"
    )
    base.write.parquet(target)
    updates = spark.createDataFrame(
        [(2, "B", 20.0), (4, "d", 4.0)], "id long, s string, v double"
    )
    merge_upsert(spark, target, updates, ["id"])
    got = {r.id: (r.s, r.v) for r in spark.read.parquet(target).collect()}
    assert got == {1: ("a", 1.0), 2: ("B", 20.0), 3: ("c", 3.0), 4: ("d", 4.0)}
    # idempotent re-merge
    merge_upsert(spark, target, updates, ["id"])
    assert {r.id for r in spark.read.parquet(target).collect()} == {1, 2, 3, 4}


def test_compact_parquet(spark, tmp_path):
    path = str(tmp_path / "frag")
    li = load_table(spark, SF_SMALL, "lineitem")
    li.repartition(24).write.parquet(path)  # 24 small files
    before = li.count()
    import pathlib

    n_before = len(list(pathlib.Path(path).glob("*.parquet")))
    assert n_before >= 20
    n_files = compact_parquet(spark, path, target_file_bytes=10 * 1024 * 1024)
    n_after = len(list(pathlib.Path(path).glob("*.parquet")))
    assert n_after == n_files < n_before
    assert spark.read.parquet(path).count() == before


def test_pq_adc_identity_and_recall(spark):
    """ADC lookup-table scores must EQUAL dot(q, reconstruction) (identity,
    not approximation), and the quantized candidate set must cover most of
    the exact top-10 (seeded training + fixed scan order => deterministic)."""
    from hive_person_service_spark.operators.pq import (
        decode_pq,
        encode_pq,
        pq_topk,
        train_pq,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    cb = train_pq(emb, m=16, ksub=128, seed=42)
    assert cb.shape == (16, 128, 4)
    enc = encode_pq(emb, cb)

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    q = mat[ids == 0][0]

    crows = enc.collect()
    codes = np.array([r["codes"] for r in crows], dtype=np.int64)
    rec = decode_pq(codes, cb)
    lut = np.stack([cb[j] @ q[j * 4 : (j + 1) * 4] for j in range(16)])
    adc = lut[np.arange(16)[None, :], codes].sum(axis=1)
    assert np.abs(adc - rec @ q).max() < 1e-9

    exact = set(ids[ids != 0][np.argsort(-(mat[ids != 0] @ q))[:10]])
    cand = {
        r["vec_id"]
        for r in pq_topk(enc.where(F.col("vec_id") != 0), cb, q, k=50).collect()
    }
    assert len(exact & cand) >= 9  # m=16/ksub=128: near-lossless at this n


def test_ivfpq_recall_and_fullprobe(spark):
    """Composed IVF+PQ (residual codes, multi-assign=2): (a) recall@10 vs
    exact at nprobe=8/refine=20 >= 0.9; (b) probing ALL cells with a
    corpus-wide refine reduces to the exact search (the approximation
    comes only from cell pruning + candidate cut)."""
    from hive_person_service_spark.operators.pq import build_ivfpq, ivfpq_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    corpus = emb.where(F.col("vec_id") != 0)
    coded, centroids, codebooks = build_ivfpq(
        emb, nlist=16, m=16, ksub=128, seed=42, assign=2
    )
    coded = coded.where(F.col("vec_id") != 0)

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    q = mat[ids == 0][0]
    exact = set(ids[ids != 0][np.argsort(-(mat[ids != 0] @ q))[:10]])

    got = {
        r.vec_id
        for r in ivfpq_topk(
            spark, coded, corpus, centroids, codebooks, q,
            k=10, nprobe=8, refine=20,
        ).collect()
    }
    assert len(exact & got) >= 9  # floor 0.9 (VERDICT r3 item 1)

    full = {
        r.vec_id
        for r in ivfpq_topk(
            spark, coded, corpus, centroids, codebooks, q,
            k=10, nprobe=16, refine=50,
        ).collect()
    }
    assert full == exact


def test_ivfpq_recall_floor_and_monotone(spark):
    """The round-4 quality pin (VERDICT r3 item 1): on the sf0.01 fixture
    (500 near-random unit vectors -- the hard ANN case), mean recall@10
    over 8 spread query vectors must be >= 0.9 at nprobe=8/refine=20 and
    non-decreasing in nprobe. Residual codebooks + multi-assignment are
    what buys this; the round-3 raw-vector codebooks topped out at 0.43
    and wobbled with nprobe."""
    from hive_person_service_spark.operators.pq import build_ivfpq, ivfpq_topk

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    coded, centroids, codebooks = build_ivfpq(
        emb, nlist=16, m=16, ksub=128, seed=42, assign=2
    )
    coded = coded.persist()
    coded.count()

    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    n = len(ids)
    q_idx = np.arange(0, n, n // 8)[:8]
    truths = {}
    for i in q_idx:
        mask = ids != ids[i]
        truths[int(ids[i])] = set(
            ids[mask][np.argsort(-(mat[mask] @ mat[i]))[:10]].tolist()
        )

    curve = []
    for nprobe in (1, 2, 4, 8):
        recs = []
        for i in q_idx:
            qid = int(ids[i])
            got = {
                r.vec_id
                for r in ivfpq_topk(
                    spark,
                    coded.where(F.col("vec_id") != qid),
                    emb.where(F.col("vec_id") != qid),
                    centroids,
                    codebooks,
                    mat[i],
                    k=10,
                    nprobe=nprobe,
                    refine=20,
                ).collect()
            }
            recs.append(len(got & truths[qid]) / 10)
        curve.append(float(np.mean(recs)))
    coded.unpersist()
    assert curve[-1] >= 0.9, f"recall@10 floor broken at nprobe=8: {curve}"
    for lo, hi in zip(curve, curve[1:]):
        assert hi >= lo - 1e-9, f"recall not monotone in nprobe: {curve}"


def test_ivf_delete_vectors_dataframe_ids(spark, tmp_path):
    """Large-delete-set path: ids arrive as a DataFrame and are applied
    via broadcast semi/anti joins (plan size independent of delete
    cardinality); untouched cells stay byte-identical, same contract as
    the literal-list path."""
    import os

    from hive_person_service_spark.operators.ivf import (
        ivf_delete_vectors,
        read_ivf_index,
        write_ivf_index,
    )

    emb = load_table(spark, SF_SMALL, "embeddings")
    n0 = emb.count()
    root = str(tmp_path / "ivf_dfdel")
    write_ivf_index(emb, root, nlist=16)
    vectors, _ = read_ivf_index(spark, root)
    victims = vectors.limit(40).select("vec_id")
    victim_ids = {r.vec_id for r in victims.collect()}
    victim_cells = {
        r.cell
        for r in vectors.where(
            F.col("vec_id").isin([int(i) for i in victim_ids])
        ).select("cell").distinct().collect()
    }

    def cell_state():
        out = {}
        vdir = os.path.join(root, "vectors")
        for d in sorted(os.listdir(vdir)):
            if d.startswith("cell="):
                out[d] = sorted(
                    f for f in os.listdir(os.path.join(vdir, d))
                    if f.endswith(".parquet")
                )
        return out

    before = cell_state()
    deleted = ivf_delete_vectors(spark, root, victims)
    assert deleted == len(victim_ids)
    after = cell_state()
    for d, files in before.items():
        cell_id = int(d.split("=")[1])
        if cell_id not in victim_cells and d in after:
            assert after[d] == files, f"delete rewrote untouched {d}"
    vectors2, _ = read_ivf_index(spark, root)
    assert vectors2.count() == n0 - len(victim_ids)
    assert vectors2.where(
        F.col("vec_id").isin([int(i) for i in victim_ids])
    ).count() == 0
