"""Driver-contract tests: entry() compiles and runs; dryrun_multichip(8)
executes the sharded PPO step on the virtual 8-device CPU mesh."""

import jax

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    bstate2, reward, value, logp = out
    assert reward.shape == (256,)
    assert value.shape == (256,)


def test_dryrun_multichip():
    graft.dryrun_multichip(8)
