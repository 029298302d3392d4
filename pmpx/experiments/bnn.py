"""Mean-field BNN posterior sampling via PMP-HMC (the reference's flagship).

Parity with ``Bayesian Network Training/main.py``: torchbnn-style BayesLinear
MLP 784-1024-10 over full-batch MNIST, PMP-HMC with the clamped-Barker tree
rule (``main.py:84-99``), N = 2**n - 1 via the ``n`` argument (the
reference's ``--N`` CLI flag), 30000 steps at paper scale, trajectory of the
first 10 parameters recorded (``main.py:169-171``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from pmpx import tree
from pmpx.config import SamplerSpec
from pmpx.data import load_mnist
from pmpx.metrics.recorder import save_trace
from pmpx.models import BayesMLP
from pmpx.samplers.base import run_chain
from pmpx.targets.nn import NNPosterior


def run(
    n: int = 2,  # the reference's --N: parallelism 2**n - 1
    algo: str = "pmp_hmc",  # | "sp_hmc" (the notebook's A100 baseline)
    hidden: int = 1024,
    step_size: float = 0.1,
    mom_scale: float = 0.0005,
    num_steps=None,
    n_train=None,
    n_test=None,
    seed: int = 0,
    out_dir: str = "results/bnn",
    scale: str = "smoke",
    label_noise: float = 0.0,
    class_sep: float = 1.5,
    chunk_steps=None,
    resume: bool = False,
):
    """``algo="sp_hmc"`` runs the single-proposal HMC baseline the
    reference's speedup analysis compares against
    (``MNIST_bnn_NVIDIAA100.ipynb`` cell 8 ``bnnHmc``).  ``scale="paper"``
    is the full 30,000-step protocol (``main.py:179-190``);
    ``chunk_steps`` makes it checkpoint-resumable and yields a
    compile-excluded steady-state ms/superstep."""
    if scale == "paper":
        # explicit n_train/n_test still win (shrunken-batch rate probes)
        n_train = 60000 if n_train is None else n_train
        n_test = 10000 if n_test is None else n_test
        if num_steps is None:
            num_steps = 30000
        if chunk_steps is None:
            chunk_steps = 1000
    else:
        n_train = 4096 if n_train is None else n_train
        n_test = 1024 if n_test is None else n_test
        if num_steps is None:
            num_steps = 30
    N = 2**n - 1
    depth = max(tree.binary_depth(N + 1), 1)
    x_tr, y_tr, x_te, y_te = load_mnist(
        n_train=n_train, n_test=n_test, class_sep=class_sep,
        label_noise=label_noise,
    )
    target = NNPosterior(
        BayesMLP(hidden=hidden), x_tr, y_tr,
        init_key=jax.random.key(seed), stochastic=True,
    )
    theta0 = target.init_theta()
    if algo == "sp_hmc":
        spec = SamplerSpec(
            algo="sp_hmc", step_size=step_size, mom_scale=mom_scale
        )
        name = "bnn_sphmc"
    else:
        spec = SamplerSpec(
            algo="pmp_hmc", depth=depth, step_size=step_size,
            mom_scale=mom_scale, rule="barker_clamp",
        )
        name = f"bnn_pmphmc_N{N}"
    superstep = spec.build(target)

    # the reference records loss, accuracy, and the trajectory of the
    # first 10 parameters (main.py:169-171, 187-190)
    def collect(theta, out):
        loss = -target.log_prob(theta, key=jax.random.key(123))
        acc = target.accuracy(theta, key=jax.random.key(124))
        return loss, acc, theta[:10]

    meta = {"N": N, "algo": algo, "num_steps": num_steps}
    if chunk_steps:
        import os

        from pmpx.checkpoint import (
            TraceAccumulator, resume_chain, save_checkpoint,
        )

        ckpt = os.path.join(out_dir, f"{name}.ckpt")
        fresh = not (resume and os.path.exists(ckpt))
        acc = TraceAccumulator(
            out_dir, name, ("loss", "acc", "trajectory10"), fresh=fresh
        )
        if fresh:
            save_checkpoint(ckpt, theta0, jax.random.key(seed + 1), 0)
        resume_chain(
            superstep, ckpt, num_steps, collect=collect,
            checkpoint_every=chunk_steps, on_chunk=acc,
            bind=target.bound_data, bind_args=(x_tr,),
        )
        arrays = {k: acc.load(k) for k in acc.keys}
        steady = acc.steady_s_per_step(chunk_steps)
        if steady is not None:
            meta["steady_ms_per_superstep"] = steady * 1e3
    else:
        @jax.jit
        def run_fn(k, t, X):
            # dataset as a jit argument (not an embedded HLO constant)
            with target.bound_data(X):
                return run_chain(
                    superstep, k, t, num_steps, collect=collect
                )

        _, (losses, accs, traj) = run_fn(
            jax.random.key(seed + 1), theta0, x_tr
        )
        arrays = {
            "loss": np.asarray(losses),
            "acc": np.asarray(accs),
            "trajectory10": np.asarray(traj),
        }
    save_trace(out_dir, name, arrays, meta)
    out = {
        "N": N,
        "algo": algo,
        "loss_first": float(arrays["loss"][0]),
        "loss_last": float(arrays["loss"][-1]),
        "acc_last": float(arrays["acc"][-1]),
    }
    if "steady_ms_per_superstep" in meta:
        out["steady_ms_per_superstep"] = meta["steady_ms_per_superstep"]
    return out
