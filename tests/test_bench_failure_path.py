"""bench.py failure-path contract (VERDICT r3 #1).

Round 3's official bench artifact was lost because the driver's timeout
killed bench.py mid-retry BEFORE its machine-readable record was printed
(BENCH_r03.json rc=124, parsed=null).  The contract now pinned here:

  * the failure path is bounded (default worst case ~150 s; in this test
    the knobs are turned down so it finishes in seconds);
  * a provisional machine-readable record appears on stdout IMMEDIATELY
    at the first failed probe — a driver kill at any later point still
    parses a valid last line;
  * the final (and the provisional) record carries the most recent staged
    measurement flagged as ``stale_previous_measurement``;
  * rc == 0 (the JSON error record IS the result).

No TPU is needed: on this CPU test backend the probe's
``assert platform == 'tpu'`` fails fast, which exercises exactly the
retry/provisional/stale machinery.
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(tmp_path, extra_env=None):
    partial = tmp_path / "partial.json"
    partial.write_text(json.dumps({
        "metric": "yolov5s_twostream_640_paired_inference",
        "value": 1234.5, "unit": "img/s", "vs_baseline": 0.617,
        "ts": "2026-08-19T00:00:00"}) + "\n")
    env = dict(os.environ,
               BENCH_PARTIAL_PATH=str(partial),
               BENCH_PROBE_TIMEOUT="20",
               BENCH_RETRIES="1",
               BENCH_BACKOFF="0",
               BENCH_TOTAL_BUDGET="60",
               JAX_PLATFORMS="cpu")
    env.update(extra_env or {})
    t0 = time.monotonic()
    proc = subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=600, env=env)
    return proc, time.monotonic() - t0


def test_dead_tpu_failure_path_bounded_with_early_record(tmp_path):
    proc, dt = _run_bench(tmp_path)
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    records = [json.loads(ln) for ln in lines]
    # provisional emitted at the first failed probe, final at the end —
    # at least two parseable lines, so a kill between them still parses
    assert len(records) >= 2
    assert "provisional" in records[0]["error"]
    last = records[-1]
    assert last["metric"] == "yolov5s_twostream_640_paired_inference"
    assert last["value"] == 0.0
    assert "error" in last
    # the staged previous measurement is surfaced, flagged stale, on BOTH
    for rec in (records[0], last):
        stale = rec["stale_previous_measurement"]
        assert stale["value"] == 1234.5
        assert stale["ts"] == "2026-08-19T00:00:00"
    # bounded: 2 probe attempts x <=20 s + slack.  The slack is generous
    # because python startup for the probe subprocesses stretches ~4x when
    # the host core is timeshared (observed: >180 s wall during a round-5
    # suite run concurrent with two training jobs); the contract pinned
    # here is bench's INTERNAL budget (driver-window safety), not wall
    # under starvation — 300 s still sits well inside the driver's window
    assert dt < 300, f"failure path took {dt:.0f}s"


def test_budget_exhaustion_still_emits_record(tmp_path):
    # a zero total budget must short-circuit straight to the final record
    proc, dt = _run_bench(tmp_path, {"BENCH_TOTAL_BUDGET": "0",
                                     "BENCH_RETRIES": "5"})
    assert proc.returncode == 0
    records = [json.loads(ln)
               for ln in proc.stdout.splitlines() if ln.strip()]
    assert records, "no record emitted"
    assert records[-1]["value"] == 0.0
    assert "budget" in records[-1]["error"]
    assert dt < 120
