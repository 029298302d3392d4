"""Convergence vs. parallelism P with a wall-clock budget.

Parity with ``simple_net/MP_and_PMP_Convergence_with_Cores/convery_time_*.cu``:
the reference runs MP (N=1023) and binary-tree PMP for up to 20k iterations
bounded by ``set_time=180`` seconds (loop guard ``convery_time_MP.cu:173``)
and compares parameter error at equal wall-clock across P.  Here each P runs
in fixed-size jitted chunks until the budget expires (data-dependent loop
exit lives on the host between chunks; the hot loop stays on-device).
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

TRUE = np.array([-1.0, 2.0, 0.5])


def run(
    n_data: int = 100000,
    Ps=(4, 16, 64, 256, 1024),
    set_time: float = 5.0,
    chunk: int = 200,
    algo: str = "pmp",
    fused_call_steps: int = 100_000,
    seed: int = 0,
    out_dir: str = "results/cores",
    scale: str = "smoke",
    method: str = "auto",
):
    Ps = as_tuple(Ps)
    if scale == "paper":
        set_time = 180.0
    fused_chain = method == "fused_chain"
    x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
    target = BayesLinReg(
        x, y, temper=1.0 / 2000.0,
        method="fused" if fused_chain else method,
    )
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    out, traces = {}, {}
    for P in Ps:
        if algo == "pmp":
            depth = tree.binary_depth(P)
            spec = SamplerSpec(
                algo="pmp", N=1, depth=depth, step_size=0.02,
                selection="all_first",
            )
        else:
            spec = SamplerSpec(
                algo="mp", N=P - 1, step_size=0.02,
                selection="all_first",
            )
        if fused_chain:
            # whole chain chunks in one Pallas kernel (see ess_msjd).
            # One *dispatch* carries many kernel launches: the remote
            # transport quantizes wall-clock ~40 ms per dispatch, so a
            # 1000-step call would be dispatch-bound at ~40 us/iter —
            # 100k steps per call amortizes that to the kernel's own
            # ~2-4 us/iter while staying far under the transport's
            # long-execution limit (~0.4 s per call).
            from pmpx.kernels import fused_chain as fc

            call_steps = max(chunk, fused_call_steps)
            runk = fc.make_fused_chain(
                target, fc.spec_to_cfg(spec), chunk=min(chunk, 1000)
            )

            def f(k, t, r=runk, c=call_steps):
                tr = r(k, t, c)
                return tr[-1], tr

            f = jax.jit(f)
            chunk_iters = call_steps
        else:
            chunk_iters = chunk
            superstep = spec.build(target)
            f = jax.jit(
                lambda k, t, s=superstep: run_chain(
                    s, k, t, chunk, collect=lambda th, o: th
                )
            )
        theta = theta0
        key = jax.random.key(seed + 1)
        f(key, theta)[0].block_until_ready()  # compile outside budget
        iters = 0
        t0 = time.perf_counter()
        last = None
        while time.perf_counter() - t0 < set_time:
            key, k = jax.random.split(key)
            theta, roots = f(k, theta)
            roots.block_until_ready()
            last = np.asarray(roots)
            iters += chunk_iters
        err = (
            float(np.abs(np.abs(last[-chunk // 2 :]) - np.abs(TRUE)).mean())
            if last is not None
            else float("nan")
        )
        out[f"P{P}_iters"] = iters
        out[f"P{P}_err"] = err
        traces[f"P{P}_tail"] = last if last is not None else np.zeros((0, 3))
    save_trace(out_dir, f"cores_{algo}", traces, {"set_time": set_time})
    return out
