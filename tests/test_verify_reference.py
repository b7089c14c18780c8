"""The SURVEY §9 re-verification hook must skip loudly on the empty mount and
actually diff when a reference appears (exercised with a synthetic reference
implementing the pinned semantics)."""

import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "verify_reference.py")


def _run(*args):
    return subprocess.run(
        [sys.executable, SCRIPT, *args],
        capture_output=True, text=True, timeout=300, cwd=REPO,
    )


def test_skips_loudly_on_empty_mount(tmp_path):
    empty = tmp_path / "reference"
    empty.mkdir()
    p = _run("--reference", str(empty))
    assert p.returncode == 0, p.stdout + p.stderr
    assert "SKIP" in p.stdout and "EMPTY" in p.stdout
    # every pin of the §9 checklist is enumerated in the skip output
    for pin in ("noise_form", "continuous_decode", "relative_decode",
                "reward_form", "growth_may", "id_map", "defaults"):
        assert pin in p.stdout, f"pin {pin} missing from the skip checklist"


def test_diffs_against_a_populated_reference(tmp_path):
    pytest.importorskip("gymnasium")
    pkg = tmp_path / "ref" / "gym_fishing"
    (pkg / "envs").mkdir(parents=True)
    (pkg / "__init__.py").write_text(textwrap.dedent("""
        import gymnasium as gym
        gym.register(id="fishing-v1",
                     entry_point="gym_fishing.envs:FishingCtsEnv")
    """))
    (pkg / "envs" / "__init__.py").write_text(
        "from gym_fishing.envs.base_fishing_env import FishingCtsEnv\n"
    )
    (pkg / "envs" / "base_fishing_env.py").write_text(textwrap.dedent("""
        import numpy as np
        import gymnasium as gym
        from gymnasium import spaces

        class FishingCtsEnv(gym.Env):
            def __init__(self, K=1.0, r=0.3, price=1.0, sigma=0.05,
                         init_state=0.75, Tmax=100, **kw):
                self.K, self.r, self.price, self.sigma = K, r, price, sigma
                self.init_state, self.Tmax = init_state, Tmax
                self.action_space = spaces.Box(-1.0, 1.0, (1,), np.float32)
                self.observation_space = spaces.Box(-1.0, 1.0, (1,), np.float32)
                self.reset()

            def reset(self, seed=None, options=None):
                self.fish_population = self.init_state
                self.years_passed = 0
                return self.get_obs(), {}

            def get_obs(self):
                o = min(max(self.fish_population / self.K - 1.0, -1.0), 1.0)
                return np.asarray([o], np.float32)

            def step(self, action):
                a = float(np.asarray(action).reshape(()))
                a = min(max(a, -1.0), 1.0)
                quota = (a + 1.0) * self.K
                harvest = min(self.fish_population, quota)
                self.fish_population -= harvest
                x = self.fish_population
                mu = x + self.r * x * (1.0 - x / self.K)
                self.fish_population = max(
                    mu + self.sigma * x * np.random.normal(), 0.0)
                self.years_passed += 1
                terminated = self.fish_population <= 0.0
                truncated = self.years_passed >= self.Tmax
                return (self.get_obs(), self.price * harvest, terminated,
                        truncated, {"fish_population": self.fish_population})
    """))
    p = _run("--reference", str(tmp_path / "ref"))
    assert p.returncode == 0, p.stdout + p.stderr
    assert "POPULATED" in p.stdout
    assert "[VERIFIED ] continuous_decode" in p.stdout
    assert "[VERIFIED ] noise_form" in p.stdout
    assert "0 pins DIFFER" in p.stdout
