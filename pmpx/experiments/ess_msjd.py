"""ESS/s and MSJD/s vs. parallelism P.

Parity with ``simple_net/MP_and_PMP_ESS_per_sec_and_MSJD_per_sec/``: the
reference dumps million-step MP/PMP sample streams per P in
{8..512} (``data_trans.py:8``) and computes ESS/MSJD offline with code not
in the repo.  Here the whole pipeline is on-device: run, time, compute ESS
(Geyer) and MSJD per second, emit the machine-readable table behind
``ess_compare.pdf``/``msjd_compare.pdf``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from pmpx import tree
from pmpx.config import SamplerSpec
from pmpx.experiments._common import as_tuple
from pmpx.metrics import ess, msjd
from pmpx.metrics.recorder import save_trace
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg


def run(
    n_data: int = 10000,
    Ps=(8, 32, 128, 512),
    num_steps: int = 2000,
    burn_in: int = 200,
    algos=("mp", "pmp"),
    seed: int = 0,
    out_dir: str = "results/ess",
    scale: str = "smoke",
    method: str = "auto",
    chains: int = 1,
):
    """``chains > 1`` (fused path only): run that many independent
    chains sequentially via ``lax.map`` inside one jit (one TensorCore
    serializes them either way; Mosaic rejects batched SMEM scalar
    blocks under vmap) and report *aggregate* ESS/s and MSJD/s (summed
    across chains) — the multi-chain sampling-throughput figure of
    merit.  The reference's counterpart is hand-pinning independent
    processes to GPUs."""
    Ps = as_tuple(Ps)
    algos = as_tuple(algos)
    if scale == "paper":
        n_data, num_steps, burn_in = 100000, 1_000_000, 2000
    fused_chain = method == "fused_chain"
    if chains > 1 and not fused_chain:
        raise ValueError("chains > 1 requires method='fused_chain'")
    x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
    target = BayesLinReg(
        x, y, temper=1.0 / 2000.0,
        method="fused" if fused_chain else method,
    )
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    out = {}
    rows = []
    for algo in algos:
        for P in Ps:
            if algo == "pmp":
                spec = SamplerSpec(
                    algo="pmp", N=1, depth=tree.binary_depth(P),
                    step_size=0.02, selection="all_first",
                )
            else:
                spec = SamplerSpec(
                    algo="mp", N=P - 1, step_size=0.02,
                    selection="all_first",
                )
            if fused_chain:
                # whole chain chunks inside one Pallas kernel: the
                # per-superstep op floor disappears, multiplying ESS/s
                # and MSJD/s at identical chain statistics (the trace IS
                # the root path the scan's collect records)
                from pmpx.kernels import fused_chain as fc

                runk = fc.make_fused_chain(
                    target, fc.spec_to_cfg(spec), chunk=1000
                )
                if chains > 1:
                    # sequential lax.map, not vmap: one TensorCore
                    # serializes the chains either way, and Mosaic
                    # rejects batched SMEM scalar blocks under vmap
                    f = jax.jit(
                        lambda k, t, r=runk: (
                            t,
                            jax.lax.map(
                                lambda kk: r(kk, t, num_steps),
                                jax.random.split(k, chains),
                            ),
                        )
                    )
                else:
                    f = jax.jit(
                        lambda k, t, r=runk: (t, r(k, t, num_steps))
                    )
            else:
                superstep = spec.build(target)

                from pmpx.samplers.base import run_chain

                f = jax.jit(
                    lambda k, t, s=superstep: run_chain(
                        s, k, t, num_steps, collect=lambda th, o: th
                    )
                )
            f(jax.random.key(seed), theta0)[1].block_until_ready()
            t0 = time.perf_counter()
            _, roots = f(jax.random.key(seed), theta0)
            roots.block_until_ready()
            dt = time.perf_counter() - t0
            if chains > 1:
                rc = np.asarray(roots)[:, burn_in:]  # (C, steps, 3)
                e = float(sum(
                    float(ess(jnp.asarray(c[:, 0]))) for c in rc
                ))
                m = float(sum(
                    float(msjd(jnp.asarray(c))) * len(c) for c in rc
                )) / dt
                key_sfx = f"_chains{chains}"
            else:
                r = np.asarray(roots)[burn_in:]
                e = float(ess(jnp.asarray(r[:, 0])))
                m = float(msjd(jnp.asarray(r))) * len(r) / dt
                key_sfx = ""
            rows.append((algo, P, e / dt, m, dt))
            out[f"{algo}_P{P}{key_sfx}_ess_per_s"] = e / dt
            out[f"{algo}_P{P}{key_sfx}_msjd_per_s"] = m
    save_trace(
        out_dir,
        "ess_msjd",
        {"rows": np.asarray([(r[2], r[3], r[4]) for r in rows])},
        {"rows": [f"{r[0]}_P{r[1]}" for r in rows], "summary": out},
    )
    try:
        from pmpx.experiments.plots import render_ess_msjd
        import json as _json
        import os as _os

        sp = _os.path.join(out_dir, "summary.json")
        with open(sp, "w") as f:
            _json.dump(out, f, indent=2)
        render_ess_msjd(sp, out_dir)
    except Exception:
        pass
    return out
