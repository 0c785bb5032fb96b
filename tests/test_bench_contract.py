"""The bench artifact contract (hard-learned in round 3, where the driver's
bench timed out with zero output): a default `python bench.py` run must

  1. print the HEADLINE JSON line — metric/value/unit/vs_baseline/
     step_time_ms — as its FIRST stdout line, immediately after the device
     timing loop (extras must never gate it);
  2. exit 0;
  3. end with a consolidated line carrying the same metric and a superset
     of the headline keys (the driver parses the LAST line).

Runs the real bench flow on the CPU backend (BENCH_PLATFORM=cpu) with a
tiny model and BENCH_BUDGET_S=0 so every budget-gated extra is skipped —
which is itself part of the contract: the headline must land even when the
budget is already exhausted."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.heavy  # one full XLA:CPU compile of the train step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADLINE_KEYS = {"metric", "value", "unit", "vs_baseline", "step_time_ms"}


def test_bench_headline_contract():
    env = dict(
        os.environ,
        BENCH_PLATFORM="cpu",
        BENCH_MODEL="ViT-S-32",
        BENCH_BATCH="4",
        BENCH_STEPS="2",
        BENCH_WARMUP="1",
        BENCH_BUDGET_S="0",
    )
    env.pop("BENCH_FULL", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert len(lines) >= 2, proc.stdout

    headline = json.loads(lines[0])
    assert HEADLINE_KEYS <= set(headline), headline
    assert headline["value"] > 0
    assert headline["unit"] == "images/sec/chip"
    # vs_baseline is rounded to 4 decimals in the artifact
    assert headline["vs_baseline"] == pytest.approx(
        headline["value"] / 3000.0, rel=1e-3, abs=5.1e-5)

    # every stdout line is one parseable JSON object (the driver tails and
    # parses blind)
    parsed = [json.loads(ln) for ln in lines]

    # consolidated last line: same metric, superset of the headline keys
    last = parsed[-1]
    assert last["metric"] == headline["metric"]
    assert HEADLINE_KEYS <= set(last)
    assert last["value"] == headline["value"]

    # BENCH_BUDGET_S=0 must skip every gated extra (only the env-versions
    # line may appear between headline and the consolidated line)
    for obj in parsed[1:-1]:
        assert obj["metric"] == "bench environment", obj
