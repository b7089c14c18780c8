"""ctypes bindings for the C oracle (native/oracle.c).

Compiled on demand (cc -O2 -shared -fPIC) into native/_build/ and cached by
source mtime. The binding mirrors the Python oracle's injected-noise
protocol: same params layout as EnvParams, same growth/noise/scheme enums.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from gym_fishing_tpu.core.types import DECODE_SCHEMES, GROWTH_MODELS, NOISE_FORMS

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "oracle.c")
_BUILD_DIR = os.path.join(_HERE, "_build")
_SO = os.path.join(_BUILD_DIR, "liboracle.so")

GROWTH_IDX = {name: i for i, name in enumerate(GROWTH_MODELS)}
NOISE_IDX = {name: i for i, name in enumerate(NOISE_FORMS)}
SCHEME_IDX = {name: i for i, name in enumerate(DECODE_SCHEMES)}

PARAM_ORDER = (
    "r", "K", "sigma", "sigma_m", "price", "cost", "init_state",
    "init_harvest", "Tmax", "action_scale", "A", "B", "C", "theta",
    "a", "b", "q", "n_actions", "collapse_penalty", "r_drift",
)

_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> str:
    """Compile the shared object if stale; returns its path."""
    os.makedirs(_BUILD_DIR, exist_ok=True)
    if (
        not force
        and os.path.exists(_SO)
        and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
    ):
        return _SO
    cc = os.environ.get("CC", "cc")
    subprocess.run(
        [cc, "-O2", "-shared", "-fPIC", "-o", _SO, _SRC, "-lm"],
        check=True,
        capture_output=True,
    )
    return _SO


def _load() -> ctypes.CDLL:
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(build())
        D = ctypes.POINTER(ctypes.c_double)
        U8 = ctypes.POINTER(ctypes.c_uint8)
        I64 = ctypes.POINTER(ctypes.c_int64)
        lib.oracle_rollout.restype = ctypes.c_int64
        lib.oracle_rollout.argtypes = [
            D, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_int64,
            D, D, D, ctypes.c_int64,
            D, D, D, U8, D, D,
        ]
        lib.oracle_step_batch.restype = None
        lib.oracle_step_batch.argtypes = [
            D, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int64,
            D, D, I64, D, D, D, D, D, U8,
        ]
        _lib = lib
    return _lib


def available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


class COracle:
    """Drop-in analog of oracle.rollout_xi, backed by the C library."""

    def __init__(self, cfg):
        """cfg: an OracleConfig (oracle.oracle) or EnvParams-like object with
        matching attribute names; growth/noise_form/scheme read from cfg."""
        growth = cfg.growth
        if growth == "mixture":  # resolve static model for the C stepper
            growth = GROWTH_MODELS[int(cfg.model_idx)]
        self.growth = GROWTH_IDX[growth]
        self.noise = NOISE_IDX[cfg.noise_form]
        self.scheme = SCHEME_IDX[cfg.scheme]
        self.params = np.asarray(
            [float(getattr(cfg, name)) for name in PARAM_ORDER], np.float64
        )
        self.cfg = cfg
        self.lib = _load()

    def rollout_xi(self, actions, xis, etas=None, x0=None, h0=None):
        """Injected-noise trajectory; same output dict as the Python oracle."""
        T = len(actions)
        if self.scheme == SCHEME_IDX["continuous"]:
            acts = np.asarray([float(np.asarray(a).reshape(())) for a in actions], np.float64)
        else:
            acts = np.asarray([float(int(a)) for a in actions], np.float64)
        xis = np.ascontiguousarray(xis, np.float64)
        etas = (
            np.zeros(T) if etas is None else np.ascontiguousarray(etas, np.float64)
        )
        stock = np.empty(T)
        obs = np.empty(T)
        reward = np.empty(T)
        done = np.empty(T, np.uint8)
        harvest = np.empty(T)
        quota = np.empty(T)
        x0 = float(self.cfg.init_state) if x0 is None else float(x0)
        h0 = float(self.cfg.init_harvest) if h0 is None else float(h0)
        n = self.lib.oracle_rollout(
            _dp(self.params), self.growth, self.noise, self.scheme,
            x0, h0, 0,
            _dp(acts), _dp(xis), _dp(etas), T,
            _dp(stock), _dp(obs), _dp(reward),
            done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            _dp(harvest), _dp(quota),
        )
        sl = slice(0, int(n))
        return {
            "stock": stock[sl], "obs": obs[sl], "reward": reward[sl],
            "done": done[sl].astype(bool), "harvest": harvest[sl],
            "quota": quota[sl],
        }

    def step_batch(self, x, h, t, actions, xis, etas=None):
        """Lockstep batch step (in-place on x/h/t); returns (obs, reward, done)."""
        n = x.shape[0]
        if self.scheme == SCHEME_IDX["continuous"]:
            acts = np.ascontiguousarray(np.reshape(actions, (n,)), np.float64)
        else:
            acts = np.ascontiguousarray(actions, np.float64)
        xis = np.ascontiguousarray(xis, np.float64)
        etas = np.zeros(n) if etas is None else np.ascontiguousarray(etas, np.float64)
        obs = np.empty(n)
        reward = np.empty(n)
        done = np.empty(n, np.uint8)
        self.lib.oracle_step_batch(
            _dp(self.params), self.growth, self.noise, self.scheme, n,
            _dp(x), _dp(h), t.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            _dp(acts), _dp(xis), _dp(etas),
            _dp(obs), _dp(reward),
            done.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return obs, reward, done.astype(bool)
