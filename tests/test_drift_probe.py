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


class TestLatestRecordedBench:
    """bench.py's prev-round anchor loader: picks the NEWEST recorded
    round with min-of-3 protocol + probe ratio at sf0.1, skips
    single-shot rounds (<= r6) and malformed files."""

    def _write(self, d, n, parsed):
        import json

        (d / f"BENCH_r{n}.json").write_text(
            json.dumps({"n": n, "parsed": parsed})
        )

    def test_picks_newest_min_of_3_and_skips_single_shot(self, tmp_path):
        from bench import _latest_recorded_bench

        # r6-style: no protocol field -> excluded
        self._write(
            tmp_path,
            6,
            {
                "queries": {"q01_pricing_summary": 1.4},
                "drift_probe": {"ratio": 0.95},
                "sf": 0.1,
            },
        )
        ok = {
            "protocol": "min_of_3",
            "queries": {"q01_pricing_summary": 1.2},
            "drift_probe": {"ratio": 0.9},
            "sf": 0.1,
        }
        self._write(tmp_path, 7, ok)
        self._write(tmp_path, 8, dict(ok, queries={"q01_pricing_summary": 1.1}))
        # newer but wrong sf -> excluded
        self._write(tmp_path, 9, dict(ok, sf=0.01))
        (tmp_path / "BENCH_r10.json").write_text("{not json")
        n, rec = _latest_recorded_bench(str(tmp_path))
        assert n == 8
        assert rec["queries"]["q01_pricing_summary"] == 1.1

    def test_none_when_only_single_shot_rounds(self, tmp_path):
        from bench import _latest_recorded_bench

        self._write(
            tmp_path,
            6,
            {
                "queries": {"q01_pricing_summary": 1.4},
                "drift_probe": {"ratio": 0.95},
                "sf": 0.1,
            },
        )
        assert _latest_recorded_bench(str(tmp_path)) is None


class TestEnvironmentInvalidGate:
    """r11 (the r10 verdict's task #1): a drift ratio above
    DRIFT_INVALID_GATE makes a record ineligible as a prev-round anchor,
    and front-truncated tails (r8/r9 driver records) reconstruct
    mechanically so the newest CLEAN round still anchors."""

    def _write(self, d, n, parsed=None, **extra):
        import json

        (d / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"n": n, "parsed": parsed, **extra})
        )

    def test_contended_host_record_never_anchors(self, tmp_path):
        from bench import _latest_recorded_bench

        ok = {
            "protocol": "min_of_3",
            "queries": {"q01_pricing_summary": 1.2},
            "drift_probe": {"ratio": 0.9},
            "sf": 0.1,
        }
        self._write(tmp_path, 9, ok)
        # newer, but its own probe read 1.9x (the sealed-r10 shape)
        self._write(
            tmp_path, 10, dict(ok, drift_probe={"ratio": 1.9})
        )
        # and one explicitly stamped invalid
        self._write(
            tmp_path, 11, dict(ok, environment_invalid=True)
        )
        n, rec = _latest_recorded_bench(str(tmp_path))
        assert n == 9
        assert rec["drift_probe"]["ratio"] == 0.9

    def test_front_truncated_tail_reconstructs(self, tmp_path):
        import json

        from bench import _latest_recorded_bench

        # the r9 record shape: parsed=null, tail cut mid-queries with a
        # partial first entry whose suffix uniquely names q01, plus the
        # stderr bench-note glued on
        tail = (
            'ary": 1.435, "q03_shipping_priority": 0.994}, '
            '"queries_single_shot": {"q01_pricing_summary": 1.5, '
            '"q03_shipping_priority": 1.1}, "single_shot_total": 2.6, '
            '"sf": 0.1, "drift_probe": {"ratio": 0.95}, '
            '"normalized_value": 2.557}'
            "\nbench-note: min-of-3 per query; blah."
        )
        (tmp_path / "BENCH_r09.json").write_text(
            json.dumps({"n": 9, "parsed": None, "tail": tail})
        )
        n, rec = _latest_recorded_bench(str(tmp_path))
        assert n == 9
        assert rec["reconstructed_from_tail"] is True
        assert rec["queries"]["q01_pricing_summary"] == 1.435
        assert rec["queries"]["q03_shipping_priority"] == 0.994
        assert rec["value"] == 2.429
        assert rec["protocol"] == "min_of_3"

    def test_r12_format_front_cut_reconstructs_fully(self, tmp_path):
        """r12 reorders the bench JSON so the critical fields live at
        the line's END: a front-truncated tail re-opens into a complete
        record at the first intact key — full per-query map, probe, and
        normalized total all survive (r11's old-order tail preserved
        only 5 of 16 queries)."""
        import json

        from bench import _latest_recorded_bench

        tail = (
            'ized": 3.1, "moved_x": 0.9}, '
            '"value": 13.87, "protocol": "min_of_3", '
            '"queries": {"q01_pricing_summary": 1.2, '
            '"q03_shipping_priority": 1.0}, "sf": 0.1, '
            '"drift_probe": {"ratio": 1.26, "era_ratio": 1.05}, '
            '"environment": {"load_pre": 0.1, "suspect": false}, '
            '"environment_invalid": false, "normalized_value": 11.0}'
            "\nbench-note: min-of-3 per query; blah."
        )
        (tmp_path / "BENCH_r12.json").write_text(
            json.dumps({"n": 12, "parsed": None, "tail": tail})
        )
        n, rec = _latest_recorded_bench(str(tmp_path))
        assert n == 12
        assert rec["reconstructed_from_tail"] is True
        assert len(rec["queries"]) == 2
        assert rec["value"] == 13.87
        assert rec["normalized_value"] == 11.0
        assert rec["drift_probe"]["era_ratio"] == 1.05

    def test_truncated_tail_without_min_of_3_marker_excluded(self, tmp_path):
        import json

        from bench import _latest_recorded_bench

        # a single-shot-era record (no queries_single_shot field) must
        # not be mislabeled min-of-3 by reconstruction
        tail = (
            'ary": 1.435, "q03_shipping_priority": 0.994}, "sf": 0.1, '
            '"drift_probe": {"ratio": 0.95}}'
        )
        (tmp_path / "BENCH_r05.json").write_text(
            json.dumps({"n": 5, "parsed": None, "tail": tail})
        )
        assert _latest_recorded_bench(str(tmp_path)) is None

    def test_real_repo_anchor_invariants(self):
        """Round-INDEPENDENT invariants on the live repo's anchor. The
        old version pinned `n == 11`, which the driver's own sealed
        BENCH_r12.json flipped the moment the round closed — every
        absolute-round assertion on the live repo is one sealed record
        away from red (r12 verdict #1). Absolute-round pins belong on
        tmp_path fixtures (the sibling tests above); here we assert
        only what must hold for EVERY future sealed record."""
        from bench import DRIFT_INVALID_GATE, _latest_recorded_bench

        got = _latest_recorded_bench()
        assert got is not None
        n, rec = got
        # r10 and earlier can never anchor (r10 probe 1.9x = invalid;
        # <= r6 single-shot); the floor is round-independent
        assert n >= 11
        # the returned record actually passes the loader's own gates
        gate_ratio = (
            rec["drift_probe"].get("era_ratio") or rec["drift_probe"]["ratio"]
        )
        assert gate_ratio <= DRIFT_INVALID_GATE
        assert not rec.get("environment_invalid")
        assert rec.get("sf") == 0.1
        # the full-total comparison in main() needs the sealed
        # normalized_value (tail reconstruction keeps only a ~2000-char
        # query subset) plus enough per-query rows to flag regressions
        assert rec.get("normalized_value") is not None
        assert len(rec["queries"]) >= 5

    def test_real_repo_newest_valid_wins_and_invalid_never_anchors(
        self, tmp_path
    ):
        """Newest-valid-wins / invalid-never-anchors, exercised ON TOP
        of the live repo's sealed records (copied to tmp_path so no
        future driver artifact can flip the assertion): a newer valid
        record must take the anchor; a newer INVALID one must not."""
        import glob
        import json as _json
        import os
        import shutil

        import bench
        from bench import _latest_recorded_bench

        here = os.path.dirname(os.path.abspath(bench.__file__))
        for p in glob.glob(os.path.join(here, "BENCH_r*.json")):
            shutil.copy(p, tmp_path / os.path.basename(p))
        base = _latest_recorded_bench(str(tmp_path))
        assert base is not None and base[0] >= 11
        ok = {
            "protocol": "min_of_3",
            "queries": {"q01_pricing_summary": 1.0},
            "drift_probe": {"ratio": 0.9, "era_ratio": 0.95},
            "sf": 0.1,
            "normalized_value": 10.0,
        }
        (tmp_path / "BENCH_r99.json").write_text(
            _json.dumps({"n": 99, "parsed": ok})
        )
        got = _latest_recorded_bench(str(tmp_path))
        assert got is not None and got[0] == 99
        bad = dict(ok, drift_probe={"ratio": 2.4, "era_ratio": 2.4})
        (tmp_path / "BENCH_r100.json").write_text(
            _json.dumps({"n": 100, "parsed": bad})
        )
        got = _latest_recorded_bench(str(tmp_path))
        assert got is not None and got[0] == 99  # invalid never anchors


class TestEnvironmentSuspectTier:
    """r11 introduced the suspect tier; r12 softened its ANCHOR rule:
    with the stale r6 probe baseline every recent clean run tripped
    suspect, starving prev_round_comparison of anchors. A suspect (but
    not invalid) record now anchors WITH the flag
    (anchor_environment_suspect) so readers weigh it; main() still
    renders a would-be 'regressed' verdict on a suspect HOST as
    'environment-suspect'."""

    def _write(self, d, n, parsed=None, **extra):
        import json

        (d / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"n": n, "parsed": parsed, **extra})
        )

    def test_suspect_record_anchors_newest_first(self, tmp_path):
        from bench import _latest_recorded_bench

        ok = {
            "protocol": "min_of_3",
            "queries": {"q01_pricing_summary": 1.2},
            "drift_probe": {"ratio": 0.9},
            "sf": 0.1,
        }
        self._write(tmp_path, 9, ok)
        self._write(
            tmp_path,
            10,
            dict(
                ok,
                environment={
                    "load_pre": 4.8,
                    "probe_spread": 0.05,
                    "suspect": True,
                },
            ),
        )
        n, rec = _latest_recorded_bench(str(tmp_path))
        assert n == 10  # newest valid wins; the suspect flag travels
        assert (rec.get("environment") or {}).get("suspect") is True

    def test_era_gate_prefers_era_ratio(self, tmp_path):
        """From r12 records carry era_ratio: a record whose r6 ratio is
        1.6 (over the gate) but whose era_ratio is 1.05 is a HEALTHY
        current-era host and must anchor; conversely era_ratio 1.6 is
        invalid regardless of the r6 number."""
        from bench import _latest_recorded_bench

        ok = {
            "protocol": "min_of_3",
            "queries": {"q01_pricing_summary": 1.2},
            "sf": 0.1,
        }
        self._write(
            tmp_path, 12,
            dict(ok, drift_probe={"ratio": 1.6, "era_ratio": 1.05}),
        )
        n, _rec = _latest_recorded_bench(str(tmp_path))
        assert n == 12
        self._write(
            tmp_path, 13,
            dict(ok, drift_probe={"ratio": 1.2, "era_ratio": 1.6}),
        )
        n, _rec = _latest_recorded_bench(str(tmp_path))
        assert n == 12  # 13's era_ratio is over the invalid gate


class TestEnvFlagsStateMachine:
    """r12 (the r11 verdict's task #1): the environment tiers judge the
    probe against the CURRENT era baseline — an idle current-era host
    reads era_ratio ~1.0 and renders non-suspect, ending the stale-
    baseline false-suspect era (judge observed 1.24-1.41x vs the r6
    baseline on a 0.05-load machine)."""

    def test_start_retry_gate_is_consistent_with_spread_gate(self):
        """r13 (the r12 verdict's task #2): any start-probe reading the
        retry gate lets STAND must be unable to trip the spread gate
        against a clean end probe at the rested-host floor. The old
        gate (1.25) left a no-retry window (era 1.13..1.25) that
        GUARANTEED a suspect seal whenever the end probe came in clean
        — the exact shape of the r12 record (start 1.196 / end 0.927,
        spread 0.29)."""
        from bench import (
            PROBE_CLEAN_ERA_FLOOR,
            PROBE_SPREAD_GATE,
            PROBE_START_RETRY_GATE,
        )

        # a start probe at the retry gate vs a clean end probe at the
        # floor produces spread exactly AT (never above) the gate
        worst_standing_spread = (
            PROBE_START_RETRY_GATE / PROBE_CLEAN_ERA_FLOOR - 1.0
        )
        assert worst_standing_spread <= PROBE_SPREAD_GATE + 1e-9
        # the sealed r12 readings: the start probe must now be
        # retry-eligible
        assert 1.196 > PROBE_START_RETRY_GATE
        # and the observed rested-host end probe sits above the frozen
        # floor (the floor is conservative, not aspirational)
        assert 0.927 >= PROBE_CLEAN_ERA_FLOOR

    def test_spread_is_position_normalized(self):
        """r13: the start probe runs at census warmth, the end probe
        after the full headline suite — structurally ~1.26x apart on a
        VERIFIED-idle host (load 0.03, window steal 0.06%: start
        1.48 s / end 1.17 s; the sealed r12 record shows 1.636/1.268 =
        1.29x). The spread must normalize each probe by its position's
        baseline so warm-up structure cancels and only host
        instability trips the gate."""
        from bench import (
            ERA_BASELINE_END_SEC,
            ERA_BASELINE_SEC,
            PROBE_SPREAD_GATE,
            probe_spread_norm,
        )

        # the two baselines encode the measured structural gap
        assert 1.1 < ERA_BASELINE_SEC / ERA_BASELINE_END_SEC < 1.4
        # the cleanest rehearsal ever taken (which the RAW spread
        # flagged suspect at 0.265) now reads well under the gate
        assert probe_spread_norm(1.48, 1.17) < PROBE_SPREAD_GATE
        # the sealed r12 readings — judge-arbitrated as calibration,
        # not contention — also clear the gate
        assert probe_spread_norm(1.636, 1.268) < PROBE_SPREAD_GATE
        # genuine END-side contention still trips: an end probe reading
        # era-high against a clean start is host degradation mid-window
        assert probe_spread_norm(1.37, 1.6) > PROBE_SPREAD_GATE
        # a mid-window pre-retry spike survives a passing retry
        assert probe_spread_norm(1.37, 1.17, 1.9) > PROBE_SPREAD_GATE
        assert probe_spread_norm(1.37, 1.17, None) < PROBE_SPREAD_GATE

    def test_steal_window_integral(self):
        """r13: the suspect gate judges the WINDOW-average steal, not a
        1-second endpoint instant (one ~40 ms scheduling blip reads 4%+
        in a 1 s sample yet is noise over a 7-minute window — the r13
        rehearsal sealed suspect on exactly that)."""
        from bench import steal_counters, steal_window_pct

        assert steal_window_pct((1000, 10), (2000, 30)) == 2.0
        assert steal_window_pct(None, (2000, 30)) is None
        assert steal_window_pct((1000, 10), (1000, 10)) is None
        # live read works on this platform and is monotone-consistent
        a = steal_counters()
        assert a is not None and a[0] > 0 and a[1] >= 0
        # a 4.2% endpoint blip with a clean window average must NOT
        # taint the record (gate takes the window value)
        from bench import STEAL_SUSPECT_GATE, env_flags

        window_avg = 0.3
        assert window_avg < STEAL_SUSPECT_GATE < 4.22
        assert env_flags(1.0, 0.1, 0.05, False, window_avg) == (
            False,
            False,
        )

    def test_idle_current_era_host_is_clean(self):
        from bench import env_flags

        assert env_flags(1.0, 0.05, 0.05, False) == (False, False)
        # the exact readings the judge observed on an idle host, once
        # re-based to the era baseline, stay clean
        assert env_flags(1.02, 0.05, 0.1, False) == (False, False)

    def test_sick_host_is_invalid(self):
        from bench import env_flags

        assert env_flags(1.6, 0.05, 0.0, False) == (True, False)

    def test_contended_tiers_are_suspect(self):
        from bench import env_flags

        assert env_flags(1.0, 5.0, 0.0, False) == (False, True)  # load
        assert env_flags(1.0, 0.1, 0.3, False) == (False, True)  # spread
        assert env_flags(1.0, 0.1, 0.0, True) == (False, True)  # retry
        # hypervisor steal (r12): the direct noisy-neighbor signal —
        # this round caught a 3% steal phase inflating JVM queries
        # 1.3-3.7x while loadavg read 0.1
        assert env_flags(1.0, 0.1, 0.0, False, 3.0) == (False, True)
        assert env_flags(1.0, 0.1, 0.0, False, 0.5) == (False, False)

    def test_invalid_dominates_suspect(self):
        from bench import env_flags

        assert env_flags(2.0, 9.0, 0.9, True) == (True, False)

    def _write(self, d, n, parsed=None):
        import json

        (d / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"n": n, "parsed": parsed})
        )

    def test_clean_environment_block_still_anchors(self, tmp_path):
        from bench import _latest_recorded_bench

        ok = {
            "protocol": "min_of_3",
            "queries": {"q01_pricing_summary": 1.2},
            "drift_probe": {"ratio": 0.9},
            "sf": 0.1,
            "environment": {
                "load_pre": 0.3,
                "probe_spread": 0.02,
                "suspect": False,
            },
        }
        self._write(tmp_path, 12, ok)
        n, _rec = _latest_recorded_bench(str(tmp_path))
        assert n == 12
