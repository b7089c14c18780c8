"""stable-baselines3-style facades over the JAX learners.

Reference workloads train via sb3: `PPO("MlpPolicy", env).learn(300_000)` then
`env.simulate(model)` (reference: README usage, SURVEY.md §3.5;
reconstructed). These facades reproduce that workflow verbatim on the TPU
engine — no torch, no host round-trips in the rollout — so reference users
can port scripts by changing only the import. `A2C` shares the on-policy
surface; `SAC`, `TD3` (continuous) and `DQN` (discrete) get the same surface
over the off-policy learners.

    from gym_fishing_tpu.agents.sb3_like import PPO
    model = PPO("MlpPolicy", "fishing-v1", num_envs=4096)
    model.learn(total_timesteps=2_000_000)
    action, _ = model.predict(obs)
    model.save("ppo_fishing")
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gym_fishing_tpu.agents.a2c import A2CConfig, a2c_train_step, make_a2c_state
from gym_fishing_tpu.agents.dqn import DQNConfig, DQNPolicy, dqn_train_step, make_dqn_state
from gym_fishing_tpu.agents.ppo import (
    PPOConfig,
    PPOPolicy,
    make_train_state,
    train_step,
)
from gym_fishing_tpu.agents.sac import SACConfig, SACPolicy, make_sac_state, sac_train_step
from gym_fishing_tpu.agents.td3 import TD3Config, TD3Policy, make_td3_state, td3_train_step
from gym_fishing_tpu.batch import batched_reset
from gym_fishing_tpu.core.env import Env
from gym_fishing_tpu.core.types import EnvParams
from gym_fishing_tpu.registry.registry import make as registry_make
from gym_fishing_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def _resolve_env(env) -> Tuple[Env, EnvParams]:
    if isinstance(env, str):
        return registry_make(env)
    if isinstance(env, Env):
        return env, env.params()
    if isinstance(env, tuple) and len(env) == 2:
        return env
    # GymFishingEnv / GymnasiumFishingEnv adapters carry .env/.params
    if hasattr(env, "env") and hasattr(env, "params"):
        return env.env, env.params
    raise TypeError(f"cannot resolve environment from {type(env)!r}")


class PPO:
    """sb3-compatible surface: __init__(policy, env), learn, predict, save/load."""

    _cfg_cls = PPOConfig
    _make_ts = staticmethod(make_train_state)
    _train_step = staticmethod(train_step)

    def __init__(
        self,
        policy: str = "MlpPolicy",
        env: Any = "fishing-v1",
        seed: int = 0,
        verbose: int = 0,
        **ppo_kwargs,
    ):
        if policy != "MlpPolicy":
            raise ValueError("only MlpPolicy is supported (reference parity)")
        self.env, self.env_params = _resolve_env(env)
        self.cfg = self._cfg_cls(**ppo_kwargs)
        self.verbose = verbose
        self._key = jax.random.key(seed)
        self._key, k_init = jax.random.split(self._key)
        self.train_state = self._make_ts(self.env, self.cfg, k_init)
        self._bstate = batched_reset(self.env, self.env_params, self.cfg.num_envs)
        step_fn = type(self)._train_step
        self._jit_step = jax.jit(
            lambda ts, b, k: step_fn(self.env, self.env_params, self.cfg, ts, b, k)
        )
        self.num_timesteps = 0
        self.history: list = []

    # ------------------------------------------------------------------ learn
    def learn(self, total_timesteps: int, callback=None, log_interval: int = 10):
        per_iter = self.cfg.num_envs * self.cfg.num_steps
        iterations = max(1, math.ceil(total_timesteps / per_iter))
        for it in range(iterations):
            self._key, sub = jax.random.split(self._key)
            self.train_state, self._bstate, metrics = self._jit_step(
                self.train_state, self._bstate, sub
            )
            self.num_timesteps += per_iter
            m = {k: float(v) for k, v in metrics.items()}
            self.history.append(m)
            if callback is not None:
                callback(self, m)
            if self.verbose and it % log_interval == 0:
                print(
                    f"iter {it}/{iterations} steps={self.num_timesteps} "
                    f"ep_ret={m['episode_return']:.3f} ep_len={m['episode_length']:.1f}"
                )
        return self

    # ---------------------------------------------------------------- predict
    def predict(self, obs, state=None, episode_start=None, deterministic=True):
        return PPOPolicy(self.env, self.train_state).predict(
            obs, state=state, episode_start=episode_start, deterministic=deterministic
        )

    @property
    def policy(self) -> PPOPolicy:
        return PPOPolicy(self.env, self.train_state)

    # -------------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        save_checkpoint(
            path,
            {
                "params": self.train_state.params,
                "opt_state": self.train_state.opt_state,
                "env_state": self._bstate,
                "rng_key": self._key,
                "step": jnp.asarray(self.num_timesteps),
            },
            step=0,
        )

    @classmethod
    def load(cls, path: str, env: Any = "fishing-v1", **kwargs) -> "PPO":
        model = cls(env=env, **kwargs)
        template = {
            "params": model.train_state.params,
            "opt_state": model.train_state.opt_state,
            "env_state": model._bstate,
            "rng_key": model._key,
            "step": jnp.asarray(0),
        }
        restored, _ = restore_checkpoint(path, template, step=0)
        model.train_state = model.train_state.replace(
            params=restored["params"], opt_state=restored["opt_state"]
        )
        model._bstate = restored["env_state"]
        model._key = restored["rng_key"]
        model.num_timesteps = int(restored["step"])
        return model


class A2C(PPO):
    """sb3-style A2C: same on-policy surface, single unclipped RMSProp update."""

    _cfg_cls = A2CConfig
    _make_ts = staticmethod(make_a2c_state)
    _train_step = staticmethod(a2c_train_step)


class _OffPolicyAlgo:
    """Shared sb3-style surface for the off-policy learners (SAC/TD3/DQN).

    One `.learn` "timestep" is one batched env step of `cfg.num_envs`
    instances (sb3 counts single-env steps; here the batch is the unit, as
    with the PPO facade). The full learner state — networks, optimizers,
    targets, replay buffer, env state — checkpoints as one pytree, so
    save/load resumes training bit-exactly.
    """

    _cfg_cls = None
    _policy_cls = None
    _default_env = "fishing-v1"

    def __init__(
        self,
        policy: str = "MlpPolicy",
        env: Any = None,
        seed: int = 0,
        verbose: int = 0,
        **cfg_kwargs,
    ):
        if policy != "MlpPolicy":
            raise ValueError("only MlpPolicy is supported (reference parity)")
        self.env, self.env_params = _resolve_env(
            env if env is not None else self._default_env
        )
        self.cfg = self._cfg_cls(**cfg_kwargs)
        self.verbose = verbose
        self._key = jax.random.key(seed)
        self._key, k_init = jax.random.split(self._key)
        self.state = self._make_state(k_init)
        self._jit_step = jax.jit(self._step_fn())
        self.num_timesteps = 0
        self.history: list = []

    # Per-algo hooks -------------------------------------------------------
    def _make_state(self, key):
        raise NotImplementedError

    def _step_fn(self):
        raise NotImplementedError

    # ------------------------------------------------------------------ learn
    def learn(self, total_timesteps: int, callback=None, log_interval: int = 100):
        steps = max(1, math.ceil(total_timesteps / self.cfg.num_envs))
        for it in range(steps):
            self._key, sub = jax.random.split(self._key)
            self.state, metrics = self._jit_step(self.state, sub)
            self.num_timesteps += self.cfg.num_envs
            m = {k: float(v) for k, v in metrics.items()}
            self.history.append(m)
            if callback is not None:
                callback(self, m)
            if self.verbose and it % log_interval == 0:
                print(f"step {it}/{steps} env-steps={self.num_timesteps} "
                      f"ep_ret={m.get('episode_return', float('nan')):.3f}")
        return self

    # ---------------------------------------------------------------- predict
    @property
    def policy(self):
        return self._policy_cls(self.env, self.state)

    def predict(self, obs, state=None, episode_start=None, deterministic=True):
        return self.policy.predict(
            obs, state=state, episode_start=episode_start, deterministic=deterministic
        )

    # -------------------------------------------------------------- save/load
    def save(self, path: str) -> None:
        save_checkpoint(
            path,
            {"state": self.state, "rng_key": self._key,
             "step": jnp.asarray(self.num_timesteps)},
            step=0,
        )

    @classmethod
    def load(cls, path: str, env: Any = None, **kwargs):
        model = cls(env=env, **kwargs)
        template = {"state": model.state, "rng_key": model._key,
                    "step": jnp.asarray(0)}
        restored, _ = restore_checkpoint(path, template, step=0)
        model.state = restored["state"]
        model._key = restored["rng_key"]
        model.num_timesteps = int(restored["step"])
        return model


class SAC(_OffPolicyAlgo):
    """sb3-style SAC over the device-resident off-policy learner."""

    _cfg_cls = SACConfig
    _policy_cls = SACPolicy

    def _make_state(self, key):
        state, self._alpha_tx = make_sac_state(self.env, self.cfg, key, self.env_params)
        return state

    def _step_fn(self):
        return partial(sac_train_step, self.env, self.env_params, self.cfg, self._alpha_tx)


class TD3(_OffPolicyAlgo):
    """sb3-style TD3 over the device-resident off-policy learner."""

    _cfg_cls = TD3Config
    _policy_cls = TD3Policy

    def _make_state(self, key):
        return make_td3_state(self.env, self.cfg, key, self.env_params)

    def _step_fn(self):
        return partial(td3_train_step, self.env, self.env_params, self.cfg)


class DQN(_OffPolicyAlgo):
    """sb3-style DQN over the device-resident off-policy learner (discrete)."""

    _cfg_cls = DQNConfig
    _policy_cls = None  # DQNPolicy needs env_params; built in .policy
    _default_env = "fishing-v0"

    def _make_state(self, key):
        return make_dqn_state(self.env, self.cfg, key, self.env_params)

    def _step_fn(self):
        return partial(dqn_train_step, self.env, self.env_params, self.cfg)

    @property
    def policy(self):
        return DQNPolicy(self.env, self.state, self.env_params)
