"""Regression tests for the bench A/B drift-adjudication kernel.

The A/B artifact (AB_BENCH.json) is the round's court of record for
perf-drift claims, so its gating policy must be pinned: the "noise"
verdict gates on the sliding best-of-3 spread (not the wider raw
single-run spread — r5 ADVICE: gating on raw spread is biased toward
"noise"), and --rounds < 3 is rejected before any sampling happens.
No JVM needed: classify_drift is a pure function.
"""

from __future__ import annotations

import subprocess
import sys

import pytest

sys.path.insert(0, "/root/repo/tools")

from bench_ab import classify_drift  # noqa: E402


# 6 interleaved samples: raw spread 1.0->2.0 = 2.0x, but every
# sliding best-of-3 window bottoms out at 1.0 -> bo3 spread 1.0x.
# A recorded ratio of 1.5 sits inside raw but OUTSIDE bo3.
JITTERY = [1.0, 2.0, 1.1, 1.0, 1.9, 1.0]


class TestVerdictGating:
    def test_noise_requires_bo3_coverage_not_raw(self):
        # recorded 1.0 -> 1.5 (ratio 1.5): covered by the raw 2.0x
        # spread but NOT by the 1.0x best-of-3 spread -> must NOT be
        # called plain "noise"
        r = classify_drift(JITTERY, 1.0, 1.5, all_identical=True)
        assert r["bo3_spread_ratio"] == pytest.approx(1.0)
        assert r["spread_ratio"] == pytest.approx(2.0)
        assert r["verdict"] == "noise_single_run_only"

    def test_noise_inside_bo3(self):
        # bo3 windows: [1.0, 1.05, 1.05, 1.05] -> spread 1.05; a
        # recorded ratio of 1.04 is covered -> genuine noise
        vals = [1.0, 1.2, 1.05, 1.06, 1.05, 1.3]
        r = classify_drift(vals, 1.0, 1.04, all_identical=True)
        assert r["bo3_spread_ratio"] == pytest.approx(1.05)
        assert r["verdict"] == "noise"

    def test_recovered_at_head(self):
        # recorded old 1.2, new 3.6 (ratio 3.0 — outside both
        # spreads), but HEAD's median 1.225 reproduces the OLD value
        # within the 1.08x bo3 jitter -> the NEW recording was the
        # anomaly
        vals = [1.0, 1.2, 1.3, 1.08, 1.25, 1.3]
        r = classify_drift(vals, 1.2, 3.6, all_identical=True)
        assert r["bo3_spread_ratio"] == pytest.approx(1.08)
        assert r["verdict"] == "recovered_at_head"

    def test_unexplained_when_code_differs(self):
        # byte-differing code can never be exonerated as noise
        r = classify_drift(JITTERY, 1.0, 1.05, all_identical=False)
        assert r["verdict"] == "unexplained"

    def test_unexplained_real_regression(self):
        vals = [3.0, 3.05, 3.1, 3.0, 3.05, 3.1]  # HEAD really is 3x
        r = classify_drift(vals, 1.0, 3.0, all_identical=True)
        assert r["verdict"] == "unexplained"

    def test_control_label(self):
        r = classify_drift(JITTERY, 1.0, 1.5, True, is_control=True)
        assert r["verdict"] == "control"

    def test_missing_recorded_value(self):
        r = classify_drift(JITTERY, None, 1.5, all_identical=True)
        assert r["verdict"] == "unexplained"
        assert r["recorded_ratio"] is None


class TestRoundsValidation:
    def test_rounds_below_three_rejected_before_sampling(self):
        # argparse exits 2 BEFORE building a SparkSession (fast)
        proc = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_ab.py", "--rounds", "2"],
            capture_output=True,
            text=True,
            timeout=60,
        )
        assert proc.returncode == 2
        assert "--rounds must be >= 3" in proc.stderr


class TestTripwireGate:
    """r10: the standing drift tripwire pages only on BOTH gates —
    ratio >= 1.3 AND absolute >= 1 s — so sub-second jitter and
    small-ratio drifts on expensive queries both stay quiet."""

    def test_both_gates_required(self):
        sys.path.insert(0, "/root/repo/tools")
        from ab_tripwire import flagged_queries

        old = {"big": 8.0, "cheap": 0.3, "mild": 8.0, "gone": 2.0}
        new = {"big": 11.0, "cheap": 0.9, "mild": 9.0, "extra": 5.0}
        got = flagged_queries(old, new, 1.3, 1.0)
        # big: 1.375x and 11 s -> flagged with its recorded pair
        # cheap: 3x but sub-second -> quiet
        # mild: 1.125x -> quiet; gone/extra unshared -> ignored
        assert got == {"big": (8.0, 11.0)}

    def test_exact_threshold_inclusive(self):
        sys.path.insert(0, "/root/repo/tools")
        from ab_tripwire import flagged_queries

        old = {"q": 1.0}
        new = {"q": 1.3}
        assert flagged_queries(old, new, 1.3, 1.0) == {"q": (1.0, 1.3)}
        assert flagged_queries(old, new, 1.3, 1.5) == {}


class TestInlineTripwire:
    def test_inline_tripwire_records_receipt(self, tmp_path):
        """bench.py's in-run tripwire: flagged queries + the control
        each sample 5x and the receipt lands in AB_BENCH.json even
        when nobody runs the standalone tool."""
        import json

        sys.path.insert(0, "/root/repo")
        import bench

        calls = []
        orig = bench.run_once
        bench.run_once = lambda spark, fn, sf_dir: (
            calls.append(1), 0.5)[1]

        class _JVM:
            class System:
                @staticmethod
                def gc():
                    pass

        class _Spark:
            _jvm = _JVM()

        try:
            bench._run_inline_tripwire(
                _Spark(), "/root/testdata/sf0.01",
                {"q_topk": (1.0, 1.5)}, str(tmp_path),
            )
        finally:
            bench.run_once = orig
        doc = json.load(open(tmp_path / "AB_BENCH.json"))
        e = doc["bench_inline_tripwire"]
        assert sorted(e["queries"]) == ["q_dedup_hash", "q_topk"]
        assert len(calls) == 10  # 2 queries x 5 interleaved samples
        assert e["queries"]["q_dedup_hash"]["verdict"] == "control"
        assert e["queries"]["q_topk"]["code_identity"]["depth"] == (
            "not-checked-inline"
        )


class TestCpuNormalizedCompare:
    """r13 VERDICT directive 2: bench_compare reports a
    CPU-normalized shared-total ratio (total / cpu-control median)
    alongside the raw one, so a host-throughput step reads as
    arithmetic instead of a noise adjudication."""

    def test_host_step_normalizes_out(self):
        from bench_compare import compare

        # same code, host 1.3x slower: every query AND the cpu
        # control read 1.3x -> raw flags, normalized reads 1.0
        old = {"q_a": 1.0, "q_b": 2.0}
        new = {"q_a": 1.3, "q_b": 2.6}
        rep = compare(old, new, 1.25, old_cpu=0.28, new_cpu=0.364)
        assert rep["shared_total_ratio"] == 1.3
        assert rep["cpu_normalized_shared_total_ratio"] == 1.0

    def test_real_regression_survives_normalization(self):
        from bench_compare import compare

        # host unchanged (cpu control flat), code 1.5x slower:
        # both ratios read the regression
        old = {"q_a": 1.0}
        new = {"q_a": 1.5}
        rep = compare(old, new, 1.3, old_cpu=0.27, new_cpu=0.27)
        assert rep["shared_total_ratio"] == 1.5
        assert rep["cpu_normalized_shared_total_ratio"] == 1.5

    def test_missing_cpu_medians_degrade_to_none(self):
        from bench_compare import compare

        rep = compare({"q_a": 1.0}, {"q_a": 1.1}, 1.3)
        assert rep["cpu_normalized_shared_total_ratio"] is None
        assert rep["shared_total_ratio"] == 1.1

    def test_load_cpu_median_reads_driver_wrapped_files(self):
        from bench_compare import load_cpu_median

        assert load_cpu_median("/root/repo/BENCH_r13.json") == 0.3792


from bench_compare import sibling_adjudication  # noqa: E402


def _rows(ratios):
    return [{"ratio": r} for r in ratios]


class TestSiblingAdjudication:
    """r15 (VERDICT r14 directive 4): the 16:15-style window must
    classify itself from the artifacts alone — uniform inflation on
    code-identical queries is host, even with in-band controls."""

    def test_r14_pattern_classifies_as_host(self):
        # the r14 second run: ~1.25x across the board
        rep = sibling_adjudication(_rows([1.2, 1.22, 1.25, 1.26,
                                          1.28, 1.3, 1.24, 1.27]))
        assert rep["verdict"] == "host_uniform"
        assert "faster sibling" in rep["note"]

    def test_agreeing_runs_are_equivalent(self):
        rep = sibling_adjudication(_rows([0.97, 1.0, 1.02, 1.05,
                                          0.95, 1.01]))
        assert rep["verdict"] == "equivalent"

    def test_concentrated_inflation_is_not_host(self):
        # two hot queries on a flat window: median elevated enough
        # only if most move; here median stays ~1.0 -> equivalent,
        # but with half the window hot it must NOT read host
        rep = sibling_adjudication(_rows([1.0, 1.01, 1.0, 2.5, 2.8,
                                          1.9, 1.02, 2.2]))
        assert rep["verdict"] == "query_specific"

    def test_uniformly_faster_blames_old_window(self):
        rep = sibling_adjudication(_rows([0.78, 0.8, 0.81, 0.79,
                                          0.82, 0.8]))
        assert rep["verdict"] == "host_uniform"
        assert "OLD window" in rep["note"]

    def test_empty_rows(self):
        assert sibling_adjudication([])["verdict"] == "no_shared_queries"


class TestSiblingExitCode:
    """Exit contract as of r16: a host_* verdict suppresses the
    nonzero exit ONLY with code identity — matching clean recorded
    shas (same sf/cpus), or the explicit --assert-same-code flag. A
    statistical host verdict without identity reports itself but
    keeps gating (r15 ADVICE); query_specific and
    same_commit_concentrated (hot subset on a flat median, even with
    identity) always gate — those are the investigate-me patterns."""

    def _run(self, tmp_path, old_q, new_q, *extra, old_doc=None,
             new_doc=None):
        import json as _json
        import os as _os

        o, n = tmp_path / "o.json", tmp_path / "n.json"
        o.write_text(_json.dumps(old_doc or {"queries": old_q}))
        n.write_text(_json.dumps(new_doc or {"queries": new_q}))
        r = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_compare.py",
             str(o), str(n), "--sibling", "--quiet", *extra],
            capture_output=True, text=True,
            env={**_os.environ},
        )
        import json as _json2
        return r.returncode, _json2.loads(r.stdout)

    def test_asserted_same_code_exits_zero(self, tmp_path):
        old = {f"q{i}": 1.0 for i in range(10)}
        new = {f"q{i}": 1.4 for i in range(10)}
        code, rep = self._run(tmp_path, old, new, "--assert-same-code")
        assert rep["sibling"]["verdict"] == "host_same_commit"
        assert code == 0

    def test_host_uniform_without_identity_still_gates(self, tmp_path):
        """r15 ADVICE: the same-code premise was caller-asserted and
        unverifiable — a statistical host verdict on unproven inputs
        must report itself but keep the nonzero exit."""
        old = {f"q{i}": 1.0 for i in range(10)}
        new = {f"q{i}": 1.4 for i in range(10)}
        code, rep = self._run(tmp_path, old, new)
        assert rep["sibling"]["verdict"] == "host_uniform"
        assert rep["sibling"]["same_commit"] is False
        assert code == 1

    def test_matching_git_stamp_exits_zero(self, tmp_path):
        sha = "a" * 40
        old = {f"q{i}": 1.0 for i in range(10)}
        new = {f"q{i}": 1.4 for i in range(10)}
        code, rep = self._run(
            tmp_path, None, None,
            old_doc={"queries": old, "git_sha": sha, "git_dirty": False},
            new_doc={"queries": new, "git_sha": sha, "git_dirty": False},
        )
        assert rep["sibling"]["verdict"] == "host_same_commit"
        assert rep["sibling"]["same_commit"] is True
        assert code == 0

    def test_same_sha_different_sf_is_not_identity(self, tmp_path):
        sha = "a" * 40
        old = {f"q{i}": 1.0 for i in range(10)}
        new = {f"q{i}": 1.4 for i in range(10)}
        code, rep = self._run(
            tmp_path, None, None,
            old_doc={"queries": old, "git_sha": sha,
                     "git_dirty": False, "sf": 0.1},
            new_doc={"queries": new, "git_sha": sha,
                     "git_dirty": False, "sf": 0.01},
        )
        assert rep["sibling"]["same_commit"] is False
        assert code == 1

    def test_query_specific_still_gates(self, tmp_path):
        old = {f"q{i}": 1.0 for i in range(10)}
        new = {f"q{i}": (2.5 if i < 3 else 1.0) for i in range(10)}
        code, rep = self._run(tmp_path, old, new)
        assert rep["sibling"]["verdict"] == "query_specific"
        assert code == 1

    def test_assertion_refused_when_shas_differ(self, tmp_path):
        """--assert-same-code may fill in MISSING identity, never
        contradict recorded identity: two different recorded shas
        refute the caller's claim — exit 2, no adjudication."""
        old = {f"q{i}": 1.0 for i in range(10)}
        new = {f"q{i}": 1.4 for i in range(10)}
        import json as _json
        import os as _os

        o, n = tmp_path / "o2.json", tmp_path / "n2.json"
        o.write_text(_json.dumps(
            {"queries": old, "git_sha": "a" * 40, "git_dirty": False}))
        n.write_text(_json.dumps(
            {"queries": new, "git_sha": "b" * 40, "git_dirty": False}))
        r = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_compare.py",
             str(o), str(n), "--sibling", "--quiet",
             "--assert-same-code"],
            capture_output=True, text=True, env={**_os.environ},
        )
        assert r.returncode == 2
        assert "contradicts" in r.stderr

    def test_concentrated_gates_even_with_assertion(self, tmp_path):
        """Same-code assertion on a CONCENTRATED pattern (hot subset,
        flat median): identity proves it is not a code change, but
        same code can still plan differently (AQE/stats/environment)
        — the reproducible-flip possibility keeps the gate (r16
        review find: an unconditional host verdict here would wave
        it through)."""
        old = {f"q{i}": 1.0 for i in range(10)}
        new = {f"q{i}": (2.5 if i < 3 else 1.0) for i in range(10)}
        code, rep = self._run(tmp_path, old, new, "--assert-same-code")
        assert rep["sibling"]["verdict"] == "same_commit_concentrated"
        assert code == 1

    def test_assertion_refused_on_param_mismatch(self, tmp_path):
        """--assert-same-code with recorded sf differing: the refusal
        must name the failed premise, not silently ignore the flag."""
        import json as _json
        import os as _os

        old = {f"q{i}": 1.0 for i in range(10)}
        new = {f"q{i}": 1.4 for i in range(10)}
        o, n = tmp_path / "o3.json", tmp_path / "n3.json"
        o.write_text(_json.dumps({"queries": old, "sf": 0.1}))
        n.write_text(_json.dumps({"queries": new, "sf": 0.01}))
        r = subprocess.run(
            [sys.executable, "/root/repo/tools/bench_compare.py",
             str(o), str(n), "--sibling", "--quiet",
             "--assert-same-code"],
            capture_output=True, text=True, env={**_os.environ},
        )
        assert r.returncode == 2
        assert "sf differs" in r.stderr


class TestR15SiblingPair:
    """VERDICT r15 directive 2 'done' gate: the exact r15
    driver-run-vs-record pair (same commit, heteroscedastic
    1.01-1.96x inflation) must classify as host from the artifacts
    alone. The committed fixture carries both runs' per-query times
    and control medians verbatim (provenance inside the file)."""

    @pytest.fixture(scope="class")
    def pair(self):
        import json as _json

        with open("/root/repo/tests/fixtures/r15_sibling_pair.json") as fh:
            return _json.load(fh)

    def _per_query(self, pair):
        rec, drv = pair["record"]["queries"], pair["driver"]["queries"]
        return [
            {"query": q, "old_sec": rec[q], "new_sec": drv[q],
             "ratio": drv[q] / rec[q]}
            for q in sorted(set(rec) & set(drv))
        ]

    def _meta(self, side, with_sha=True):
        m = {
            "floor_median": side["contamination"]["median_sec"],
            "cpu_median": side["contamination"]["cpu_median_sec"],
        }
        if with_sha:
            m["git_sha"] = side["git_sha"]
            m["git_dirty"] = side["git_dirty"]
        return m

    def test_identity_mode_classifies_host(self, pair):
        from bench_compare import sibling_adjudication

        rep = sibling_adjudication(
            self._per_query(pair),
            meta_old=self._meta(pair["record"]),
            meta_new=self._meta(pair["driver"]),
        )
        assert rep["verdict"] == "host_same_commit"
        assert rep["same_commit"] is True

    def test_control_envelope_classifies_host_without_sha(self, pair):
        """Even WITHOUT the git stamp (the real r15 artifacts predate
        it), the control-envelope mode must classify the pair: every
        per-query ratio (max 1.96) is bounded by the job-floor
        control's own ratio (0.0678/0.0363 = 1.87) x tol."""
        from bench_compare import sibling_adjudication

        rep = sibling_adjudication(
            self._per_query(pair),
            meta_old=self._meta(pair["record"], with_sha=False),
            meta_new=self._meta(pair["driver"], with_sha=False),
        )
        assert rep["verdict"] == "host_control_envelope"
        assert rep["control_envelope_fraction"] >= 0.95
        # the r15 gap this closes: the flat-median uniformity test
        # alone read this pair as query_specific
        assert rep["uniform_fraction"] < 0.8
        assert rep["median_ratio"] > 1.3

    def test_floor_subtracted_diagnostic_reported(self, pair):
        from bench_compare import sibling_adjudication

        rep = sibling_adjudication(
            self._per_query(pair),
            meta_old=self._meta(pair["record"], with_sha=False),
            meta_new=self._meta(pair["driver"], with_sha=False),
        )
        assert rep["floor_subtracted_median_ratio"] is not None
        # subtracting each run's own job floor moves the median
        # toward the CPU-control ratio (the compute-bound floor)
        assert rep["floor_subtracted_median_ratio"] < rep["median_ratio"]
