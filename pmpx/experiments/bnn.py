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
    hidden: int = 1024,
    step_size: float = 0.1,
    mom_scale: float = 0.0005,
    num_steps: int = 30,
    n_train: int = 4096,
    n_test: int = 1024,
    seed: int = 0,
    out_dir: str = "results/bnn",
    scale: str = "smoke",
):
    if scale == "paper":
        n_train, n_test, num_steps = 60000, 10000, 30000
    N = 2**n - 1
    depth = max(tree.binary_depth(N + 1), 1)
    x_tr, y_tr, x_te, y_te = load_mnist(n_train=n_train, n_test=n_test)
    target = NNPosterior(
        BayesMLP(hidden=hidden), x_tr, y_tr,
        init_key=jax.random.key(seed), stochastic=True,
    )
    theta0 = target.init_theta()
    spec = SamplerSpec(
        algo="pmp_hmc", depth=depth, step_size=step_size,
        mom_scale=mom_scale, rule="barker_clamp",
    )
    superstep = spec.build(target)

    @jax.jit
    def run_fn(k, t, X):
        # dataset as a jit argument (not an embedded HLO constant)
        with target.bound_data(X):
            def collect(theta, out):
                loss = -target.log_prob(theta, key=jax.random.key(123))
                return loss, theta[:10]

            return run_chain(
                superstep, k, t, num_steps, collect=collect
            )

    _, (losses, traj) = run_fn(jax.random.key(seed + 1), theta0, x_tr)
    arrays = {
        "loss": np.asarray(losses),
        "trajectory10": np.asarray(traj),
    }
    save_trace(out_dir, f"bnn_pmphmc_N{N}", arrays, {"N": N})
    return {
        "N": N,
        "loss_first": float(arrays["loss"][0]),
        "loss_last": float(arrays["loss"][-1]),
    }
