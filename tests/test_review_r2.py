"""Regression tests for the round-2 review fixes."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx.config import SamplerSpec
from pmpx.targets import Gaussian1D


def test_reference_nn_mapping():
    """reference_nn encodes 'N means N+1 states in a binary tree' once:
    tree samplers get (N=1, depth=log2(N+1)), flat samplers keep N."""
    for algo in ("pmp", "pmp_hmc", "psp"):
        sp = SamplerSpec.reference_nn(algo, 7)
        assert (sp.N, sp.depth) == (1, 3)
    for algo in ("mp", "mp_hmc"):
        sp = SamplerSpec.reference_nn(algo, 7)
        assert sp.N == 7


@pytest.mark.parametrize("algo", ["mp", "pmp", "psp", "sp_hmc", "mp_hmc"])
def test_rule_rejected_for_fixed_rule_algos(algo):
    """Algos whose acceptance rule is fixed by the reference protocol
    reject an explicit rule= instead of silently dropping it."""
    with pytest.raises(ValueError, match="rule is not configurable"):
        SamplerSpec(algo=algo, rule="barker").build(Gaussian1D())


def test_root_logp_matches_selected_state():
    """The emitted root_logp is exactly the chosen state's log-density
    (loss collectors rely on it instead of re-evaluating the batch)."""
    t = Gaussian1D()
    for spec in (
        SamplerSpec(algo="mh", step_size=0.5),
        SamplerSpec(algo="pmp", N=1, depth=2, step_size=0.5,
                    selection="single"),
        SamplerSpec(algo="mp", N=3, step_size=0.5,
                    selection="all_uniform"),
    ):
        superstep = spec.build(t)
        theta2, out = jax.jit(superstep)(
            jax.random.key(0), jnp.array([0.3], jnp.float32)
        )
        np.testing.assert_allclose(
            float(out["root_logp"]), float(t.log_prob(theta2)),
            rtol=1e-6,
        )


def test_checkpoint_write_is_atomic(tmp_path):
    """save_checkpoint must leave either the old or the new file, never
    a torn one: it writes via temp + os.replace and cleans up."""
    from pmpx.checkpoint import load_checkpoint, save_checkpoint

    p = str(tmp_path / "chain.ckpt")
    save_checkpoint(p, jnp.arange(3.0), jax.random.key(1), 7)
    assert not os.path.exists(p + ".tmp")
    theta, key, step, _ = load_checkpoint(p)
    assert step == 7
    np.testing.assert_array_equal(np.asarray(theta), [0.0, 1.0, 2.0])
    # overwrite keeps atomicity
    save_checkpoint(p, jnp.zeros(3), jax.random.key(2), 8)
    assert not os.path.exists(p + ".tmp")
    assert load_checkpoint(p)[2] == 8


def test_mnist_chunked_resume_full_trace(tmp_path):
    """A resumed run returns the FULL loss history (pre-resume chunks
    persist via on_chunk), and re-running an already-complete run must
    not crash and must still report the complete trace."""
    from pmpx.experiments import mnist

    import glob

    from pmpx.checkpoint import load_checkpoint, save_checkpoint

    kw = dict(model="FC", algo="pmp", n_train=128, n_test=32,
              pretrain_steps=2, chunk_steps=20, out_dir=str(tmp_path))
    mnist.run(num_steps=60, **kw)
    npz = sorted(glob.glob(str(tmp_path / "*sample_number_60*.npz")))
    assert npz
    full = np.load(npz[0])["loss"]
    assert full.shape == (60,)

    # simulate a crash at step 20: rewind the checkpoint and truncate
    # the persisted trace, then resume — the final trace must cover all
    # 60 steps and be IDENTICAL to the uninterrupted run (per-step keys
    # are fold_in(base_key, step))
    ckpt = glob.glob(str(tmp_path / "*sample_number_60*.ckpt"))[0]
    trace = glob.glob(str(tmp_path / "*sample_number_60*.loss.npy"))[0]
    thetaF, base_key, _, _ = load_checkpoint(ckpt)
    # (thetaF stands in for the step-40 state: this asserts the trace
    # PERSISTENCE contract — pre-resume records survive — not the
    # continuation values, which depend on the state)
    save_checkpoint(ckpt, thetaF, base_key, 40)
    np.save(trace, full[:40])
    mnist.run(num_steps=60, resume=True, **kw)
    resumed = np.load(npz[0])["loss"]
    assert resumed.shape == (60,)
    np.testing.assert_array_equal(resumed[:40], full[:40])

    # re-run after completion: no chunks to run, still the full trace
    out3 = mnist.run(num_steps=60, resume=True, **kw)
    assert np.isfinite(out3["loss_last"])


def test_mnist_chunked_equals_result_shape(tmp_path):
    """The chunked (resume_chain) mnist path produces a full-length loss
    trace and a finite result dict, same contract as the monolithic
    scan."""
    from pmpx.experiments import mnist

    out = mnist.run(
        model="FC", algo="pmp", num_steps=60, n_train=128, n_test=32,
        pretrain_steps=2, chunk_steps=25,
        out_dir=str(tmp_path),
    )
    assert np.isfinite(out["loss_last"])
    # trace file holds all 60 steps despite 25-step chunking
    import glob

    npz = glob.glob(str(tmp_path / "*.npz"))
    assert npz, "trace not written"
    z = np.load(npz[0])
    assert z["loss"].shape == (60,)
