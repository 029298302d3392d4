"""Speedup-analysis protocol (BNN notebook parity) + misc module tests."""

import io
import contextlib

import jax
import jax.numpy as jnp
import numpy as np

from pmpx import MHConfig, Tempered, run_chain
from pmpx.config import load_spec
from pmpx.metrics import first_crossing, iteration_speedup, smooth_loss
from pmpx.resample import categorical_many
from pmpx.samplers import mh
from pmpx.targets import Gaussian1D


def test_smooth_and_crossing():
    t = np.linspace(0, 1, 500)
    loss = 2.0 * np.exp(-3 * t) + 0.01 * np.sin(40 * t)
    s = smooth_loss(loss, window=51)
    assert np.abs(s - 2.0 * np.exp(-3 * t)).max() < 0.05
    c = first_crossing(s, [1.5, 1.0, 0.5])
    assert np.all(np.diff(c) > 0)  # lower thresholds crossed later


def test_iteration_speedup_known_factor():
    """fast trace decays 4x faster -> fitted slope ~= 4."""
    t = np.arange(4000)
    base = 2.0 * np.exp(-t / 2000.0)
    fast = 2.0 * np.exp(-t / 500.0)
    slope, cf, cb = iteration_speedup(fast, base, window=11)
    assert 3.3 < slope < 4.7, slope


def test_categorical_many_distribution():
    logits = jnp.log(jnp.array([0.4, 0.1, 0.3, 0.2]))
    draws = categorical_many(jax.random.key(0), logits, 40000)
    counts = np.bincount(np.asarray(draws), minlength=4) / 40000
    np.testing.assert_allclose(
        counts, [0.4, 0.1, 0.3, 0.2], atol=0.012
    )


def test_tempered_wrapper():
    t = Tempered(Gaussian1D(), beta=0.5)
    x = jnp.array([1.5])
    assert np.isclose(
        float(t.log_prob(x)), 0.5 * float(Gaussian1D().log_prob(x))
    )
    X = jnp.array([[0.0], [1.0]])
    np.testing.assert_allclose(
        np.asarray(t.log_prob_batch(X)),
        0.5 * np.asarray(Gaussian1D().log_prob_batch(X)),
        rtol=1e-6,
    )


def test_load_spec_yaml_and_overrides(tmp_path):
    p = tmp_path / "spec.yaml"
    p.write_text(
        "sampler:\n  algo: pmp\n  N: 3\n  depth: 2\nnum_steps: 77\n"
        "custom_thing: 5\n"
    )
    spec = load_spec(str(p), overrides={"sampler.step_size": 0.25})
    assert spec.sampler.algo == "pmp"
    assert spec.sampler.N == 3
    assert spec.sampler.step_size == 0.25
    assert spec.num_steps == 77
    assert spec.extra["custom_thing"] == 5
    # the built superstep actually runs
    superstep = spec.sampler.build(Gaussian1D())
    th, out = jax.jit(superstep)(
        jax.random.key(0), jnp.zeros((1,), jnp.float32)
    )
    assert th.shape == (1,)


def test_run_chain_progress_logging(capfd):
    target = Gaussian1D()
    superstep = mh.make_superstep(target, MHConfig(step_size=0.5))
    seen = []
    _, _ = jax.jit(
        lambda k, t: run_chain(
            superstep, k, t, 30,
            log_every=10,
            log_fn=lambda step, st, o: seen.append(int(step)),
        )
    )(jax.random.key(0), jnp.zeros((1,), jnp.float32))
    jax.effects_barrier()
    assert sorted(seen) == [0, 10, 20]
