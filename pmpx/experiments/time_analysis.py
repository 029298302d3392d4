"""Per-iteration time grid: {500, 100000} data x {4, 1024} parallelism.

Parity with ``simple_net/MP_and_PMP_time_analysis/`` (the README.md:39-48
table and BASELINE.md): MP and binary-tree PMP per-iteration times.  The
reference splits "GPU time" from "additional overhead" (host processing +
H2D/D2H per iteration, ``conv_mp.cu:146-158``); in this framework the
superstep has no host component, so the total IS the device time and the
overhead column is structurally zero — reported as 0.0 for the table.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from pmpx import tree
from pmpx.config import SamplerSpec
from pmpx.experiments._common import as_tuple
from pmpx.metrics.recorder import save_trace
from pmpx.samplers.base import run_chain
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg

# A100 reference numbers (README.md:41-48): (algo, n, P) -> (gpu_us, host_us)
REFERENCE_A100 = {
    ("mp", 500, 4): (157.505, 115.84),
    ("mp", 500, 1024): (452.258, 1066.212),
    ("mp", 100000, 4): (33465.447, 346.528),
    ("mp", 100000, 1024): (33473.53, 1099.258),
    ("pmp", 500, 4): (156.927, 65.952),
    ("pmp", 500, 1024): (177.952, 1289.7),
    ("pmp", 100000, 4): (40259.869, 538.464),
    ("pmp", 100000, 1024): (42096.793, 2041.279),
}


def _time_cell(target, spec, theta0, iters, fused_chain):
    """Best-of-3 per-iteration time (us) for one sampler cell; returns
    (best_us, path) where path says which implementation was timed."""
    from pmpx.kernels import fused_chain as fc

    cfg = fc.spec_to_cfg(spec)
    cell_method = "scan"
    if fused_chain and fc.supports(cfg):
        # whole chain chunks inside one Pallas kernel: erases the
        # small-P op-launch floor (see kernels/fused_chain)
        cell_method = "fused_chain"
        runk = fc.make_fused_chain(target, cfg, chunk=min(1000, iters))
        f = lambda k, t: runk(k, t, iters)  # noqa: E731
    else:
        superstep = spec.build(target)
        f = jax.jit(
            lambda k, t, s=superstep: run_chain(
                s, k, t, iters,
                collect=lambda th, o: o["root_index"],
            )[1]
        )
    f(jax.random.key(1), theta0).block_until_ready()
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        f(jax.random.key(2 + r), theta0).block_until_ready()
        best = min(best, (time.perf_counter() - t0) / iters * 1e6)
    return best, cell_method


def run(
    data_sizes=(500, 100000),
    Ps=(4, 1024),
    iters: int = 200,
    seed: int = 0,
    out_dir: str = "results/time",
    scale: str = "smoke",
    # "sweep" = the O(P*n) kernel, like-for-like with the reference CUDA
    # kernels (BayesLinReg's "auto" would pick the fused statistics path,
    # which is the production default but not the kernel this compares)
    method: str = "sweep",
    # also time the reference's flagship general-tree shape
    # (conv_pmp.cu:85-88: N_step=7, depth=3, 512 nodes) per data size
    include_conv_pmp: bool = False,
):
    data_sizes = as_tuple(data_sizes)
    Ps = as_tuple(Ps)
    fused_chain = method == "fused_chain"
    if method == "sweep" or fused_chain:
        method = "pallas" if jax.default_backend() == "tpu" else "xla"
    out = {}
    if fused_chain:
        # eligibility, stated up front so the speedup table cannot be
        # misread as covering configs the megakernel does not implement
        out["fused_eligibility"] = (
            "fused_chain covers stabilizer='none' MP/PMP cells with "
            "P <= 1024 and power-of-two tree base N+1 (incl. general "
            "(N, depth) trees such as conv_pmp's N=7 x depth=3); "
            "zscore-stabilized NN-protocol configs, non-power-of-two "
            "bases, and P > 1024 run on the scan path — per-cell "
            "*_method records which path each number timed"
        )
    rows = []
    for n_data in data_sizes:
        x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
        temper = 1.0 / 10.0 if n_data == 500 else 1.0 / 1000.0
        target = BayesLinReg(x, y, temper=temper, method=method)
        theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
        cells = []
        for algo in ("mp", "pmp"):
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
                cells.append((algo, P, spec))
        if include_conv_pmp:
            cells.append((
                "pmp_general_N7_D3", 512,
                SamplerSpec(
                    algo="pmp", N=7, depth=3, step_size=0.02,
                    selection="all_first",
                ),
            ))
        for algo, P, spec in cells:
            best, cell_method = _time_cell(
                target, spec, theta0, iters, fused_chain
            )
            ref = REFERENCE_A100.get((algo, n_data, P))
            speedup = (
                (ref[0] + ref[1]) / best if ref is not None else None
            )
            key = f"{algo}_n{n_data}_P{P}"
            out[f"{key}_us"] = round(best, 3)
            out[f"{key}_overhead_us"] = 0.0
            if fused_chain:
                # a fused_chain request can fall back per-cell; say
                # which path was timed
                out[f"{key}_method"] = cell_method
            if speedup:
                out[f"{key}_speedup_vs_a100"] = round(speedup, 2)
            rows.append((algo, n_data, P, best))
    save_trace(
        out_dir,
        "time_analysis",
        {"rows": np.asarray([r[3] for r in rows])},
        {"rows": [f"{r[0]}_n{r[1]}_P{r[2]}" for r in rows]},
    )
    return out
