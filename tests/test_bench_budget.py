"""bench.py budget harness: the artifact must ALWAYS print.

Round-4's bench grew past the driver's time budget and died with rc=124 and
no JSON (BENCH_r04). These tests pin the budget machinery itself — section
skipping, error isolation, and the final-JSON emit — without running any
real benchmark workload.
"""
import importlib.util
import json
import os
import sys
import time

import pytest


@pytest.fixture()
def bench(monkeypatch):
    """Import bench.py fresh (module state: RESULTS/SKIPPED/_EMITTED)."""
    path = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")
    spec = importlib.util.spec_from_file_location("bench_under_test", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_under_test"] = mod
    spec.loader.exec_module(mod)
    yield mod
    sys.modules.pop("bench_under_test", None)


def test_section_runs_and_records_elapsed(bench):
    out = bench._run_section("demo", 0, lambda: {"x": 1})
    assert out == {"x": 1}
    assert bench.RESULTS["demo"] == {"x": 1}
    assert "demo" in bench.SECTIONS_ELAPSED
    assert not bench.SKIPPED


def test_section_skipped_when_budget_exhausted(bench):
    bench._T0 = time.perf_counter() - bench.BENCH_BUDGET_S - 1
    ran = []
    out = bench._run_section("late", 10, lambda: ran.append(1))
    assert out is None and not ran
    (note,) = bench.SKIPPED
    assert note["section"] == "late" and "budget" in note["reason"]


def test_section_error_is_isolated_not_fatal(bench):
    def boom():
        raise RuntimeError("synthetic failure")

    out = bench._run_section("bad", 0, boom)
    assert out is None
    assert "bad" not in bench.RESULTS
    (note,) = bench.SKIPPED
    assert note["section"] == "bad" and "synthetic failure" in note["reason"]
    # elapsed is still recorded for the failed section (diagnosability)
    assert "bad" in bench.SECTIONS_ELAPSED


def test_emit_json_with_results(bench, capsys):
    bench.RESULTS["transformer"] = {
        "fused_steps_per_sec": {"median": 1000.0, "min": 990.0,
                                "max": 1010.0},
        "device_steps_per_sec": {"median": 400.0, "min": 390.0,
                                 "max": 410.0},
        "mfu_pct_fused": 2.5,
    }
    bench.RESULTS["saturated"] = {"mfu_pct": 44.0}
    bench._emit_json()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "train_steps_per_sec"
    assert out["value"] == 1000.0
    assert out["unit"] == "steps/s"
    # vs_baseline divides by the last driver-verified artifact, NOT the
    # estimated V100 figure (round-4 verdict #7); the estimate survives
    # only under its own clearly-labeled key
    assert out["vs_baseline"] == round(
        1000.0 / bench.PREV_VERIFIED_STEPS_PER_SEC, 3)
    assert out["estimated_vs_v100"] == round(1000.0 / 20.0, 2)
    assert out["mfu_pct_fused"] == 2.5
    assert out["saturated_mfu_pct"] == 44.0
    assert out["ms_per_step_fused"] == 1.0
    assert "bench_elapsed_s" in out and "sections_elapsed_s" in out
    # emit is one-shot: a signal racing normal completion can't double-print
    bench._emit_json()
    assert capsys.readouterr().out.strip() == ""


def test_emit_json_with_nothing_completed(bench, capsys):
    bench.SKIPPED.append({"section": "transformer", "reason": "error: X"})
    bench._emit_json()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 0 and out["vs_baseline"] == 0
    assert out["skipped_sections"][0]["section"] == "transformer"


def test_long_context_rows_budget_gated_per_T(bench):
    """Each long-context row is gated independently: with a nearly-spent
    budget, no row runs and each leaves a skip note."""
    bench._T0 = time.perf_counter() - bench.BENCH_BUDGET_S + 5
    out = bench.bench_long_context(Ts=(512, 1024), B=8)
    assert out is None
    assert {n["section"] for n in bench.SKIPPED} == {
        "long_context_T512", "long_context_T1024"}


def test_section_no_result_leaves_skip_note(bench):
    """A section that returns None without raising (e.g. a child-process
    timeout swallowed internally) must leave a trace in the artifact."""
    out = bench._run_section("ring_cpu8", 0, lambda: None)
    assert out is None
    (note,) = bench.SKIPPED
    assert note["section"] == "ring_cpu8" and note["reason"] == "no result"
    # warmup-style sections opt out: no result IS the expected outcome
    bench.SKIPPED.clear()
    bench._run_section("warmup", 0, lambda: None, expect_result=False)
    assert not bench.SKIPPED


def test_ring_partial_results_survive_child_timeout(bench, monkeypatch):
    """A ring child killed at its timeout after printing RING_PART lines
    still yields the completed tags, flagged partial (live r5 failure
    mode: 513s of cold XLA:CPU compiles, then nothing in the artifact)."""
    import subprocess

    def fake_run(cmd, stdout=None, **kw):
        stdout.write('RING_PART:{"dp8": 12.5}\n')
        stdout.flush()
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    monkeypatch.setattr("subprocess.run", fake_run)
    out = bench._bench_ring_overhead(timeout_s=1)
    assert out == {"dp8": 12.5, "partial": True}


def test_long_context_warm_row_uses_2x_floor(bench, monkeypatch):
    """A previous row that finished UNDER its static floor (warm compile
    cache) must not impose the 6x cold-cache multiplier on the next row
    (live r5 run: T=2048 warm in 92.7s made T=4096's floor 556s > budget
    left, skipping a row that would have cost ~100s)."""
    bench._T0 = time.perf_counter()  # fresh full budget

    calls = []

    def fake_row(T, B):
        calls.append(T)
        # warm rows: well under every static floor
        bench.SECTIONS_ELAPSED["long_context_T%d" % T] = 80.0
        return {"max_pos_len": T, "batch_size": B}

    monkeypatch.setattr(bench, "_bench_long_context_one", fake_row)
    orig = bench._run_section

    def run_section(name, floor, fn, *a, **kw):
        out = orig(name, floor, fn, *a, **kw)
        if out is not None:
            bench.SECTIONS_ELAPSED[name] = 80.0
        return out

    monkeypatch.setattr(bench, "_run_section", run_section)
    # consume most of the budget: 6x80=480 would skip the later rows,
    # 2x80=160 (and T2048's 218 static) lets them run
    bench._T0 = time.perf_counter() - (bench.BENCH_BUDGET_S - 300)
    out = bench.bench_long_context(Ts=(512, 1024, 2048), B=8)
    assert calls == [512, 1024, 2048]
    assert out is not None and out["max_pos_len"] == 2048


def test_long_context_floor_adapts_to_measured_row_cost(bench, monkeypatch):
    """The T=2x row's floor is 6x the previous row's measured elapsed
    (cold-cache compiles scale super-linearly in T): a slow first row must
    skip the next row even when the static formula floor would allow it."""
    bench._T0 = time.perf_counter()  # fresh full budget

    def fake_row(T, B):
        # pretend the T=512 row consumed most of the budget
        bench.SECTIONS_ELAPSED["long_context_T%d" % T] = (
            bench.BENCH_BUDGET_S / 6.0) + 10
        return {"max_pos_len": T, "batch_size": B}

    monkeypatch.setattr(bench, "_bench_long_context_one", fake_row)
    # keep _run_section from overwriting the faked elapsed: call through
    orig = bench._run_section

    def run_section(name, floor, fn, *a, **kw):
        out = orig(name, floor, fn, *a, **kw)
        if out is not None:  # restore the faked cost after the real timer
            bench.SECTIONS_ELAPSED[name] = (bench.BENCH_BUDGET_S / 6.0) + 10
        return out

    monkeypatch.setattr(bench, "_run_section", run_section)
    out = bench.bench_long_context(Ts=(512, 1024), B=8)
    assert out is not None and out["max_pos_len"] == 512
    skipped = {n["section"]: n["reason"] for n in bench.SKIPPED}
    assert "long_context_T1024" in skipped
    assert "floor" in skipped["long_context_T1024"]
