"""The frozen drift probe (tools/drift_probe.py) must stay runnable and
correct: if testdata schema drift ever breaks the frozen snapshot, the
bench's cross-round normalizer silently measures an error path instead of
query time. Parity vs the live q01 also proves the probe still computes
the same thing it did in round 1."""

import pytest

from seafowl_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry():
    return load_all()


class TestDriftProbe:
    def test_frozen_q01_matches_live_q01(self, spark, registry):
        from tools.drift_probe import frozen_q01

        frozen = {
            (r["l_returnflag"], r["l_linestatus"]): r
            for r in frozen_q01(spark, SF_DIR).collect()
        }
        live = {
            (r["l_returnflag"], r["l_linestatus"]): r
            for r in registry["q01_pricing_summary"].fn(spark, SF_DIR).collect()
        }
        assert frozen.keys() == live.keys() and len(frozen) > 0
        for k in frozen:
            assert frozen[k]["sum_qty"] == live[k]["sum_qty"]
            assert frozen[k]["count_order"] == live[k]["count_order"]

    def test_run_probe_reports_ratio(self, spark):
        from tools.drift_probe import R6_BASELINE_SEC, run_probe

        out = run_probe(spark, SF_DIR, n=1)
        assert out["baseline_sec"] == R6_BASELINE_SEC
        assert out["sec"] > 0
        assert out["ratio"] == round(out["sec"] / R6_BASELINE_SEC, 3)
