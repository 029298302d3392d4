"""Skewness of chain-mean estimates vs. iterations (unbiasedness check).

Parity with ``simple_net/skewness/skewness.ipynb``: over many repeated
chains, the standardized third moment of the per-chain mean estimates should
shrink toward 0 as the chain grows; the notebook computes this over the CUDA
PMP sample dumps.  Here the repetitions are one vmapped batch of chains on
device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pmpx import tree
from pmpx.config import SamplerSpec
from pmpx.experiments._common import as_tuple, maybe_plot
from pmpx.metrics import skewness
from pmpx.metrics.recorder import save_trace
from pmpx.parallel import run_chains_vmapped
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg


def run(
    n_data: int = 4096,
    n_chains: int = 64,
    num_steps: int = 400,
    checkpoints=(50, 100, 200, 400),
    algo: str = "pmp",
    P: int = 8,
    seed: int = 0,
    out_dir: str = "results/skewness",
    scale: str = "smoke",
    method: str = "auto",
):
    checkpoints = as_tuple(checkpoints)
    temper = 50.0 / n_data
    step = 0.05
    if scale == "paper":
        # protocol parity: the reference's skewness notebook analyses the
        # CUDA ESS dumps (ess_per_s_*.cu: 100k data, tempering 1/2000,
        # alpha 0.02)
        n_data, num_steps = 100000, 100000
        checkpoints = (5000, 20000, 50000, 100000)
        temper, step = 1.0 / 2000.0, 0.02
    x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
    target = BayesLinReg(x, y, temper=temper, method=method)
    if algo == "pmp":
        spec = SamplerSpec(
            algo="pmp", N=1, depth=tree.binary_depth(P), step_size=step,
            selection="all_first",
        )
    else:
        spec = SamplerSpec(
            algo="mp", N=P - 1, step_size=step, selection="all_first"
        )
    superstep = spec.build(target)
    keys = jax.random.split(jax.random.key(seed + 1), n_chains)
    theta0 = jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32), (n_chains, 1))
    _, recs = jax.jit(
        lambda k, t: run_chains_vmapped(
            superstep, k, t, num_steps, collect=lambda th, o: th
        )
    )(keys, theta0)
    roots = np.asarray(recs)  # (chains, steps, 3)

    out = {}
    sk = []
    for c in checkpoints:
        means = roots[:, :c, 0].mean(axis=1)  # per-chain beta0 mean
        v = float(skewness(jnp.asarray(means)))
        sk.append(v)
        out[f"skewness_at_{c}"] = v
    save_trace(
        out_dir, "skewness",
        {"roots_beta0": roots[:, :, 0], "skew": np.asarray(sk)},
        {"checkpoints": list(checkpoints)},
    )

    def plot(plt):
        fig = plt.figure()
        plt.plot(list(checkpoints), sk, marker="o")
        plt.axhline(0, color="k", lw=0.5)
        plt.xlabel("iterations")
        plt.ylabel("skewness of chain means")
        fig.savefig(f"{out_dir}/skewness.pdf")

    maybe_plot(plot)
    return out
