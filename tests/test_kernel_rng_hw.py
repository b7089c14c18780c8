"""Hardware-gated kernel-RNG validation (VERDICT r1 next-step #3).

The test suite pins the CPU backend (conftest), so this test shells out to
scripts/validate_kernel_rng.py in a CLEAN environment — the script grabs the
real TPU when one is attached and compares noisy kernel trajectories against
the XLA engine distributionally (KS + moments + cross-env independence).
Skips when no TPU is attached; fails on any distributional mismatch.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "validate_kernel_rng.py")


@pytest.mark.slow
@pytest.mark.tpu
def test_kernel_rng_matches_engine_distributionally():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # let the script see the TPU
    env.pop("XLA_FLAGS", None)
    p = subprocess.run(
        [sys.executable, SCRIPT, "-B", str(1 << 16)],
        capture_output=True, text=True, timeout=580, cwd=REPO, env=env,
    )
    lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
    assert lines, f"no JSON output:\n{p.stdout}\n{p.stderr}"
    res = json.loads(lines[-1])
    if res["kernel_rng_validation"] == "SKIP":
        pytest.skip(res["reason"])
    assert p.returncode == 0, p.stdout + p.stderr
    assert res["kernel_rng_validation"] == "PASS", json.dumps(res, indent=2)
    for name, c in res["checks"].items():
        assert c["ok"], f"{name}: {c}"
