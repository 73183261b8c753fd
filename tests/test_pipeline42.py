"""Behavioral pins for batch 42: live alerts equal the batch twin, AES
roundtrip identity + determinism, quarantine counts."""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_live_alerts_equal_batch_twin(spark):
    from hive_person_service_spark.plans.pipeline42 import (
        alert_rules_batch_twin,
        stream_live_alert_rules,
    )

    live = sorted(map(tuple, stream_live_alert_rules(spark, SF_SMALL).collect()))
    twin = sorted(map(tuple, alert_rules_batch_twin(spark, SF_SMALL).collect()))
    assert live == twin
    assert live, "some hourly rule fires on the fixture"


def test_aes_roundtrip_identity_and_determinism(spark):
    from hive_person_service_spark.plans.pipeline42 import fn_aes_roundtrip

    a = fn_aes_roundtrip(spark, SF_SMALL).collect()
    assert a and all(r.roundtrip_ok for r in a)
    assert all(r.ct_bytes >= 16 for r in a)  # at least one AES block
    b = fn_aes_roundtrip(spark, SF_SMALL).collect()
    # ECB: same plaintext + key => same ciphertext across runs
    assert {(r.c_custkey, r.ct_fingerprint) for r in a} == {
        (r.c_custkey, r.ct_fingerprint) for r in b
    }


def test_quarantine_routes_exactly_the_breakage(spark):
    from hive_person_service_spark.plans.pipeline42 import (
        _N_BAD_LINES,
        source_csv_quarantine,
    )
    from hive_person_service_spark.sources import load_table

    rows = source_csv_quarantine(spark, SF_SMALL).collect()
    q = [r for r in rows if r.lang == "__quarantined__"]
    good = [r for r in rows if r.lang != "__quarantined__"]
    assert len(q) == 1 and q[0].n_good == _N_BAD_LINES
    n_docs = load_table(spark, SF_SMALL, "documents").count()
    assert sum(r.n_good for r in good) == n_docs
