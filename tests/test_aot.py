"""utils/aot.py: the AOT export cache the benchmarks use to skip per-process
tracing (the N=64 Kuka programs cost minutes of single-core Python to trace;
see the module docstring)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from parallel_ddp_tpu.presets import pendulum_swingup
from parallel_ddp_tpu.solver import make_ilqr_solver
from parallel_ddp_tpu.utils import aot


@pytest.fixture
def aot_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("PARALLEL_DDP_TPU_AOT", str(tmp_path))
    return tmp_path


def _solver_build():
    prob = pendulum_swingup(num_time_steps=16, total_time=0.5, m_blocks=2,
                            num_alpha=4)
    solver = make_ilqr_solver(prob.plant, prob.cost, prob.cfg)
    return jax.jit(lambda x, u, g: solver(x, u, g, initial_rollout=True))


def _args():
    return (jnp.zeros((16, 2)), jnp.zeros((16, 1)),
            jnp.asarray([np.pi, 0.0], jnp.float32))


def test_round_trip_and_cache_hit(aot_dir):
    args = _args()
    fn1, hit1 = aot.cached_program("t-solve", _solver_build, args)
    assert not hit1  # first build traces live and persists the export
    out1 = fn1(*args)

    fn2, hit2 = aot.cached_program("t-solve", _solver_build, args)
    assert hit2  # second load must come from the export (no trace)
    out2 = fn2(*args)
    assert float(out1.J) == float(out2.J)
    assert int(out1.iters) == int(out2.iters)
    np.testing.assert_array_equal(np.asarray(out1.x), np.asarray(out2.x))


def test_signature_mismatch_falls_back(aot_dir):
    args = _args()
    _fn, hit = aot.cached_program("t-sig", _solver_build, args)
    assert not hit
    other = (jnp.zeros((16, 2)), jnp.zeros((16, 1)),
             jnp.zeros(3, jnp.float32))  # different goal shape
    _fn2, hit2 = aot.cached_program("t-sig", _solver_build, other)
    assert not hit2  # stale signature must not load


def test_source_digest_invalidates(aot_dir, monkeypatch):
    args = _args()
    _fn, hit = aot.cached_program("t-src", _solver_build, args)
    assert not hit
    monkeypatch.setattr(aot, "_SRC_DIGEST", "deadbeef")
    _fn2, hit2 = aot.cached_program("t-src", _solver_build, args)
    assert not hit2  # any code change must invalidate every entry


def test_disabled_by_env(monkeypatch):
    monkeypatch.setenv("PARALLEL_DDP_TPU_AOT", "0")
    args = _args()
    fn, hit = aot.cached_program("t-off", _solver_build, args)
    assert not hit
    assert float(fn(*args).J) > 0.0  # still a working live build
