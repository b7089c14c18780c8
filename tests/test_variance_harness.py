"""The session-variance harness (scripts/session_variance.py) must not rot:
it is the round-over-round instrument behind BENCH_NOTES "Round 5b" and the
floor derivation. Smoke-run it in a CPU-pinned subprocess with tiny shapes
against a temp log and assert one well-formed JSON record lands."""

import json
import os
import subprocess
import sys

import pytest

SCRIPTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"
)


@pytest.mark.slow
def test_session_variance_smoke(tmp_path):
    log = tmp_path / "log.jsonl"
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env.update(
        JAX_PLATFORMS="cpu",
        VARIANCE_LOG=str(log),
        VARIANCE_NUM_ENVS="64",
        VARIANCE_NUM_STEPS="8",
        VARIANCE_ITERS="1",
        VARIANCE_SESSION="pytest-smoke",
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, "session_variance.py")],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = log.read_text().strip().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["session"] == "pytest-smoke"
    assert rec["pallas_steps_per_s"] > 0 and rec["xla_steps_per_s"] > 0
    assert "health_pre_ms" in rec and "health_post_ms" in rec
