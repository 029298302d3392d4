"""Config/spec edge cases and fallback paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx import SamplerSpec, run_chain
from pmpx.targets import Gaussian1D


def test_unknown_algo_rejected():
    with pytest.raises(ValueError):
        SamplerSpec(algo="nuts").build(Gaussian1D())


def test_mh_uniform_proposal_spec():
    """error.py SP parity path through the spec layer."""
    sup = SamplerSpec(
        algo="mh", step_size=0.25, rule="barker", proposal="uniform"
    ).build(Gaussian1D())
    _, recs = jax.jit(lambda k, x: run_chain(sup, k, x, 5000))(
        jax.random.key(0), jnp.zeros((1,))
    )
    s = np.asarray(recs["samples"]).reshape(-1)[2000:]
    # tiny uniform proposal mixes slowly; loose moments
    assert abs(s.mean()) < 0.5
    assert 0.5 < s.std() < 1.5


@pytest.mark.parametrize(
    "algo", ["mh", "mp", "psp", "pmp", "sp_hmc", "mp_hmc", "pmp_hmc"]
)
def test_every_algo_builds_and_steps(algo):
    sup = SamplerSpec(
        algo=algo, N=3, depth=2, step_size=0.3, mom_scale=1.0
    ).build(Gaussian1D())
    th, out = jax.jit(sup)(jax.random.key(1), jnp.zeros((1,)))
    assert th.shape == (1,)
    assert np.isfinite(np.asarray(th)).all()


def test_trace_writer_numpy_fallback(tmp_path, monkeypatch):
    from pmpx import runtime

    monkeypatch.setattr(runtime, "_load", lambda: None)
    p = str(tmp_path / "fb.pmpx")
    w = runtime.TraceWriter(p, width=2)
    rows = np.arange(8, dtype=np.float32).reshape(4, 2)
    for r in rows:
        w.append(r)
    assert w.flush() == 4
    assert w.close() == 4
    back = runtime.read_trace(p)
    np.testing.assert_array_equal(back, rows)
