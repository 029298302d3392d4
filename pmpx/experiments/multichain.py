"""Multi-chain convergence diagnostics: R-hat, per-chain ESS, pooled moments.

Beyond the reference (which runs independent chains only as hand-pinned
processes with no cross-chain diagnostics, SURVEY.md §2.5): C chains run as
one vmapped (single device) or shard_map'd (``chains`` mesh axis) batch,
and split-R-hat / per-chain ESS quantify convergence — the modern
diagnostics the reference's visual validation lacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.config import SamplerSpec
from pmpx.metrics import ess, split_rhat
from pmpx.metrics.recorder import save_trace
from pmpx.parallel import make_mesh, run_chains_sharded, run_chains_vmapped
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg


def run(
    n_data: int = 4096,
    n_chains: int = 8,
    num_steps: int = 800,
    algo: str = "pmp",
    N: int = 1,
    depth: int = 3,
    step_size: float = 0.05,
    sharded: bool = False,
    seed: int = 0,
    out_dir: str = "results/multichain",
    scale: str = "smoke",
    method: str = "auto",
):
    if scale == "paper":
        n_data, num_steps = 100000, 5000
    x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
    target = BayesLinReg(x, y, temper=50.0 / n_data, method=method)
    spec = SamplerSpec(
        algo=algo, N=N, depth=depth, step_size=step_size,
        selection="all_first",
    )
    superstep = spec.build(target)
    keys = jax.random.split(jax.random.key(seed + 1), n_chains)
    # overdispersed initializations in EVERY coordinate (sigma included),
    # as R-hat methodology requires
    rng = np.random.default_rng(seed)
    inits = rng.uniform(-3, 3, size=(n_chains, 2))
    sigmas = rng.uniform(0.3, 2.0, size=(n_chains, 1))
    theta0 = jnp.asarray(
        np.concatenate([inits, sigmas], axis=1), jnp.float32
    )
    collect = lambda th, o: th
    if sharded:
        mesh = make_mesh(chains=n_chains)
        _, roots = jax.jit(
            lambda k, t: run_chains_sharded(
                superstep, k, t, num_steps, mesh, collect=collect
            )
        )(keys, theta0)
    else:
        _, roots = jax.jit(
            lambda k, t: run_chains_vmapped(
                superstep, k, t, num_steps, collect=collect
            )
        )(keys, theta0)
    roots = np.asarray(roots)  # (chains, steps, 3)
    half = num_steps // 2
    tail = roots[:, half:, :]

    out = {}
    for j, name in enumerate(("beta0", "beta1", "sigma")):
        vals = np.abs(tail[:, :, j]) if name == "sigma" else tail[:, :, j]
        out[f"rhat_{name}"] = float(split_rhat(jnp.asarray(vals)))
        out[f"ess_{name}"] = float(
            np.mean([float(ess(jnp.asarray(v))) for v in vals])
        )
        out[f"mean_{name}"] = float(vals.mean())
    save_trace(out_dir, "multichain", {"roots": roots}, out)
    return out
