"""Experiments run end-to-end at smoke scale; CLI parses and dispatches;
checkpoint resume is bitwise exact."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx import PMPConfig
from pmpx.checkpoint import load_checkpoint, resume_chain, save_checkpoint
from pmpx.samplers import pmp
from pmpx.targets import Gaussian1D


def test_error_boxplot_smoke(tmp_path):
    from pmpx.experiments import error_boxplot

    out = error_boxplot.run(
        times=3, number_sample=60, out_dir=str(tmp_path)
    )
    assert set(out) == {
        "SP_abs_mean_err", "MP_abs_mean_err", "PMP_abs_mean_err"
    }
    assert all(np.isfinite(v) for v in out.values())


def test_banana_smoke(tmp_path):
    from pmpx.experiments import banana

    out = banana.run(num_steps=400, out_dir=str(tmp_path))
    assert abs(out["PMP_x2_mean"] + 8) < 4.0


def test_lb_grid_smoke(tmp_path):
    from pmpx.experiments import lb_grid

    out = lb_grid.run(
        n_data=2000, num_steps=300, steps=(0.1,),
        out_dir=str(tmp_path), method="xla",
    )
    assert abs(out["PMP_a0.1_beta0"] + 1.0) < 0.3


def test_convergence_smoke(tmp_path):
    from pmpx.experiments import convergence

    # reference tempering 1/2000 suits n=100k; scale it for smoke n
    out = convergence.run(
        n_data=4096, num_steps=300, temper=50.0 / 4096,
        out_dir=str(tmp_path), method="xla", algos=("MP", "PMP"),
    )
    assert out["PMP_us_per_iter"] > 0
    assert abs(out["PMP_beta0"] + 1.0) < 0.3


def test_correlation_smoke(tmp_path):
    from pmpx.experiments import correlation

    out = correlation.run(
        dims=(4, 8), Ns=(1, 3), nums=(20, 50), hops=60,
        out_dir=str(tmp_path),
    )
    assert "csv" in out
    import csv

    with open(out["csv"]) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 1 + 2 * 2 * 2


def test_ess_msjd_smoke(tmp_path):
    from pmpx.experiments import ess_msjd

    out = ess_msjd.run(
        n_data=1024, Ps=(8,), num_steps=300, burn_in=50,
        algos=("pmp",), out_dir=str(tmp_path), method="xla",
    )
    assert out["pmp_P8_ess_per_s"] > 0
    # summary + comparison figures rendered alongside the trace
    assert (tmp_path / "summary.json").exists()
    assert (tmp_path / "ess_compare.pdf").exists()


def test_fused_chain_method_wiring(tmp_path):
    """method='fused_chain' wires the megakernel through all three
    protocol experiments (interpret mode on CPU) and produces finite
    numbers; a zscore-stabilized spec is rejected, not silently run."""
    import pytest as _pytest

    from pmpx.experiments import cores_sweep, ess_msjd, time_analysis
    from pmpx.kernels import fused_chain as fc
    from pmpx.config import SamplerSpec

    out = ess_msjd.run(
        n_data=256, Ps=(8,), num_steps=48, burn_in=8,
        algos=("mp",), out_dir=str(tmp_path / "e"),
        method="fused_chain", chains=2,
    )
    assert out["mp_P8_chains2_ess_per_s"] > 0
    with _pytest.raises(ValueError, match="chains"):
        ess_msjd.run(n_data=256, Ps=(8,), num_steps=8, chains=2,
                     method="xla", out_dir=str(tmp_path / "e2"))
    out = cores_sweep.run(
        n_data=256, Ps=(8,), set_time=0.5, chunk=16,
        fused_call_steps=16, method="fused_chain",
        out_dir=str(tmp_path / "c"),
    )
    assert out["P8_iters"] > 0
    out = time_analysis.run(
        data_sizes=(500,), Ps=(4,), iters=16,
        method="fused_chain", out_dir=str(tmp_path / "t"),
    )
    assert out["pmp_n500_P4_method"] == "fused_chain"
    assert out["pmp_n500_P4_us"] > 0
    # the stabilizer gate: zscore specs are not the kernel's chain
    spec = SamplerSpec(algo="mp", N=7, step_size=0.1,
                       stabilizer="zscore")
    assert not fc.supports(fc.spec_to_cfg(spec))


def test_render_convergence_figure(tmp_path):
    from pmpx.experiments import convergence
    from pmpx.experiments.plots import render_convergence

    convergence.run(
        n_data=1024, num_steps=50, temper=50.0 / 1024,
        out_dir=str(tmp_path), method="xla", algos=("MP",),
    )
    assert render_convergence(
        str(tmp_path / "convergence.npz"), str(tmp_path)
    )
    assert (tmp_path / "conv_iter_and_time.pdf").exists()


def test_skewness_smoke(tmp_path):
    from pmpx.experiments import skewness as skew_exp

    out = skew_exp.run(
        n_data=1024, n_chains=16, num_steps=80,
        checkpoints=(20, 80), out_dir=str(tmp_path), method="xla",
    )
    assert np.isfinite(out["skewness_at_80"])
    # longer chains should not be more skewed than the shortest prefix
    assert abs(out["skewness_at_80"]) <= abs(out["skewness_at_20"]) + 0.5


def test_mnist_experiment_smoke(tmp_path):
    from pmpx.experiments import mnist

    out = mnist.run(
        model="FC", algo="pmp", num_steps=40, n_train=256,
        n_test=64, pretrain_steps=5, out_dir=str(tmp_path),
    )
    assert np.isfinite(out["loss_last"])
    assert 0.0 <= out["test_acc"] <= 1.0


def test_bnn_experiment_smoke(tmp_path):
    from pmpx.experiments import bnn

    out = bnn.run(
        n=1, hidden=16, num_steps=5, n_train=128, n_test=32,
        out_dir=str(tmp_path),
    )
    assert out["N"] == 1
    assert np.isfinite(out["loss_last"])


def test_cifar_hmc_smoke(tmp_path):
    from pmpx.experiments import cifar_hmc

    out = cifar_hmc.run(
        algo="pmp_hmc", N=3, num_steps=3, n_train=64, n_test=16,
        pretrain_steps=2, out_dir=str(tmp_path),
    )
    assert np.isfinite(out["loss_last"])


def test_multichain_diagnostics(tmp_path):
    from pmpx.experiments import multichain

    out = multichain.run(
        n_data=1024, n_chains=8, num_steps=400,
        out_dir=str(tmp_path), method="xla", sharded=True,
    )
    # well-mixed chains on an easy posterior: R-hat near 1
    assert out["rhat_beta0"] < 1.2, out
    assert out["ess_beta0"] > 10
    assert abs(out["mean_beta0"] + 1.0) < 0.15


def test_multichain_sweep_mode_dispatch(tmp_path):
    """run(mode="sweep") — the queue-facing chain-farm entry — parses
    comma/tuple P lists, writes the named artifact, and reports R-hat +
    aggregate ESS/s per cell."""
    from pmpx.experiments import multichain

    out = multichain.run(
        mode="sweep", ps="4,8", algos="mp", n_chains=8, num_steps=300,
        n_data=512, out_dir=str(tmp_path), out_name="farm.json",
    )
    assert [r["P"] for r in out["rows"]] == [4, 8]
    assert all(r["agg_ess_per_s"] > 0 for r in out["rows"])
    saved = json.load(open(tmp_path / "farm.json"))
    assert saved["rows"][0]["rhat_beta1"] > 0
    # CLI pre-parsed form: tuple Ps / algos
    out2 = multichain.run(
        mode="sweep", ps=(4,), algos=("mp",), n_chains=4, num_steps=200,
        n_data=512, out_dir=str(tmp_path), out_name="farm2.json",
    )
    assert len(out2["rows"]) == 1


def test_cli_list_and_run(tmp_path):
    env_script = (
        "import os;"
        "os.environ['JAX_PLATFORMS']='cpu';"
        "import sys; from pmpx.cli import main;"
        "sys.exit(main(sys.argv[1:]))"
    )
    r = subprocess.run(
        [sys.executable, "-c", env_script, "list"],
        capture_output=True, text=True,
    )
    assert r.returncode == 0 and "error_boxplot" in r.stdout
    r = subprocess.run(
        [
            sys.executable, "-c", env_script,
            "run", "error_boxplot",
            "--times", "2", "--number-sample", "40",
            "--out-dir", str(tmp_path),
        ],
        capture_output=True, text=True,
    )
    assert r.returncode == 0, r.stderr
    out = json.loads(r.stdout[r.stdout.index("{"):])
    assert "PMP_abs_mean_err" in out


def test_checkpoint_resume_bitwise(tmp_path):
    target = Gaussian1D()
    cfg = PMPConfig(N=3, depth=2, step_size=0.5)
    superstep = pmp.make_superstep(target, cfg)
    theta0 = jnp.zeros((1,), jnp.float32)
    base_key = jax.random.key(42)
    collect = lambda th, o: th

    # uninterrupted folded run
    p1 = str(tmp_path / "a.npz")
    save_checkpoint(p1, theta0, base_key, 0)
    thA, recsA = resume_chain(superstep, p1, 50, collect=collect)

    # interrupted at 20, then resumed
    p2 = str(tmp_path / "b.npz")
    save_checkpoint(p2, theta0, base_key, 0)
    _, _ = resume_chain(
        superstep, p2, 20, collect=collect, checkpoint_every=10
    )
    thB, recsB = resume_chain(superstep, p2, 50, collect=collect)

    np.testing.assert_array_equal(np.asarray(thA), np.asarray(thB))
    full_A = np.concatenate([np.asarray(r) for r in recsA])
    # recsB only contains steps 20..50; compare the tail
    tail_B = np.concatenate([np.asarray(r) for r in recsB])
    np.testing.assert_array_equal(full_A[20:], tail_B)
    # checkpoint file roundtrip
    th, key, step, _ = load_checkpoint(p2)
    assert step == 50

def test_cifar_hmc_chunked_resume(tmp_path):
    """Paper-protocol machinery at smoke scale: chunked checkpointed
    CIFAR run persists full-history loss/acc traces and a chunked rerun
    from mid-checkpoint reproduces the uninterrupted traces exactly."""
    from pmpx.experiments import cifar_hmc

    kw = dict(
        algo="pmp_hmc", N=3, num_steps=6, n_train=64, n_test=16,
        pretrain_steps=2, label_noise=0.1, chunk_steps=3,
    )
    out = cifar_hmc.run(out_dir=str(tmp_path / "a"), **kw)
    assert np.isfinite(out["loss_last"])
    a_loss = np.load(tmp_path / "a" / "cifar_pmp_hmc.loss.npy")
    a_te = np.load(tmp_path / "a" / "cifar_pmp_hmc.test_acc.npy")
    assert a_loss.shape == (6,) and a_te.shape == (6,)

    # interrupted run: first 3 steps, then resume to 6
    kw2 = dict(kw, chunk_steps=3)
    kw2["num_steps"] = 3
    cifar_hmc.run(out_dir=str(tmp_path / "b"), **kw2)
    kw2["num_steps"] = 6
    out_b = cifar_hmc.run(out_dir=str(tmp_path / "b"), resume=True, **kw2)
    b_loss = np.load(tmp_path / "b" / "cifar_pmp_hmc.loss.npy")
    np.testing.assert_array_equal(a_loss, b_loss)
    assert out_b["loss_last"] == out["loss_last"]


def test_bnn_sp_hmc_chunked(tmp_path):
    from pmpx.experiments import bnn

    out = bnn.run(
        algo="sp_hmc", hidden=16, num_steps=6, n_train=128, n_test=32,
        chunk_steps=3, out_dir=str(tmp_path),
    )
    assert out["algo"] == "sp_hmc"
    assert np.isfinite(out["loss_last"])
    assert 0.0 <= out["acc_last"] <= 1.0
    assert (tmp_path / "bnn_sphmc.loss.npy").exists()
    assert np.load(tmp_path / "bnn_sphmc.trajectory10.npy").shape == (6, 10)


def test_label_noise_caps_accuracy():
    from pmpx.data import load_mnist

    x, y, xt, yt = load_mnist(n_train=512, n_test=256, label_noise=0.3)
    x0, y0, _, yt0 = load_mnist(n_train=512, n_test=256)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x0))
    frac_tr = float((np.asarray(y) != np.asarray(y0)).mean())
    frac_te = float((np.asarray(yt) != np.asarray(yt0)).mean())
    # ~30% flips, ~90% of which change the label
    assert 0.17 < frac_tr < 0.37 and 0.17 < frac_te < 0.37


def test_ess_msjd_trace_all(tmp_path):
    """Emit-all protocol: both estimator families reported, root rows
    consistent with the all-stream rows' run."""
    from pmpx.experiments import ess_msjd

    out = ess_msjd.run(
        n_data=512, Ps=(4,), num_steps=200, burn_in=40,
        algos=("mp", "pmp"), trace="all", emit_chunk=80,
        out_dir=str(tmp_path),
    )
    for algo in ("mp", "pmp"):
        assert out[f"{algo}_P4_all_ess_per_s"] > 0
        assert out[f"{algo}_P4_all_msjd_per_s"] > 0
        assert out[f"{algo}_P4_ess_per_s"] > 0
    # emit spool is deleted unless keep_emit
    assert not list(tmp_path.glob("emit_*.npy"))
    with pytest.raises(ValueError, match="chains"):
        ess_msjd.run(trace="all", chains=2, method="fused_chain")


def test_ess_msjd_trace_all_fused(tmp_path):
    """Emit-all protocol on the production megakernel (interpret mode
    on CPU): same summary keys as the scan cell, sane magnitudes, spool
    cleanup.  The kernel math itself is oracle-tested in
    test_fused_chain.py; here the wiring (chunk looping, boundary-jump
    stitching, estimator tail) is what's under test."""
    from pmpx.experiments import ess_msjd

    # num_steps deliberately NOT a multiple of emit_chunk: the tail
    # chunk (200 steps here) must be handled — and pre-compiled outside
    # the timed window, which the warm-up loop covers by construction
    out = ess_msjd.run(
        n_data=512, Ps=(8,), num_steps=700, burn_in=100,
        algos=("pmp",), trace="all", emit_chunk=500,
        method="fused_chain", out_dir=str(tmp_path),
    )
    assert out["pmp_P8_all_ess_per_s"] > 0
    assert out["pmp_P8_all_msjd_per_s"] > 0
    assert out["pmp_P8_ess_per_s"] > 0
    # the all-stream ESS sums P per-slot streams: it must exceed the
    # root-path ESS from the same run
    assert out["pmp_P8_all_ess_per_s"] > out["pmp_P8_ess_per_s"]
    assert not list(tmp_path.glob("emit_*.npy"))


def test_emit_all_msjd_numerator_oracle(tmp_path):
    """The emit-all cell's on-device MSJD numerator equals a NumPy
    recomputation over the burn-in-trimmed flattened stream (single
    chunk, so the stream is exactly ``run_chain`` under the cell's first
    chunk key)."""
    from pmpx.config import SamplerSpec
    from pmpx.experiments.ess_msjd import _emit_all_cell
    from pmpx.samplers.base import run_chain
    from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg

    num_steps, burn_in, seed = 120, 30, 3
    x, y = make_synthetic_linreg(jax.random.key(seed), 256)
    target = BayesLinReg(x, y, temper=1.0 / 2000.0, method="xla")
    spec = SamplerSpec(
        algo="mp", N=3, step_size=0.02, selection="all_first"
    )
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    _, _, _, all_m, _ = _emit_all_cell(
        target, spec, theta0, num_steps, burn_in,
        emit_chunk=num_steps, out_dir=str(tmp_path), seed=seed,
        keep_emit=False, tag="oracle",
    )
    superstep = spec.build(target)
    _, samples = jax.jit(
        lambda k, t: run_chain(
            superstep, k, t, num_steps,
            collect=lambda th, o: o["samples"],
        )
    )(jax.random.fold_in(jax.random.key(seed), 0), theta0)
    flat = np.asarray(samples).reshape(-1, 3).astype(np.float64)
    P = 4
    d = np.diff(flat[burn_in * P:], axis=0)
    np.testing.assert_allclose(all_m, (d * d).sum(), rtol=1e-4)


def test_time_analysis_conv_pmp_cell(tmp_path):
    from pmpx.experiments import time_analysis

    out = time_analysis.run(
        data_sizes=(500,), Ps=(4,), iters=4, method="fused_chain",
        include_conv_pmp=True, out_dir=str(tmp_path),
    )
    assert "fused_eligibility" in out
    assert out["pmp_general_N7_D3_n500_P512_method"] == "fused_chain"
    assert out["pmp_general_N7_D3_n500_P512_us"] > 0


def test_nn_perf_bf16_delta_smoke():
    from pmpx.experiments import nn_perf

    out = nn_perf.bf16_delta(
        iters=2, N=3, n_mnist=128, n_cifar=128,
        # tuple, as the CLI's comma-splitting value parser delivers it
        only=("mnist_CNN_mh", "no_such_cell"),
    )
    cell = out["mnist_CNN_mh"]
    assert "error" not in cell, cell
    assert 0.0 <= cell["move_rate_f32"] <= 1.0
    assert np.isfinite(cell["mean_abs_dlogA"])
