"""Stage-by-stage timing of the emit-all megakernel's emission pipeline.

The emit="all" extension costs ~7 us/superstep over the root-only kernel
at P=512 (artifacts/ess_paper_fused/emit_overhead.json).  This script
times the kernel with the emission truncated after each stage
(``make_fused_chain(_ablate=k)``) so the cost can be attributed:

  stage 0  emit="root" baseline
  stage 1  + per-slot threshold PRNG row
  stage 2  + CDF columnization (ident * cdf lane-reduce, (L, L))
  stage 3  + counting compare (cdf_col < u_row * wsum, (L, L))
  stage 4  + one-hot O2 + SELR = Y @ O2 (MXU)
  stage 5  + PREV = SELR @ shift + within-step jump sum
  stage 6  + last-slot roll + meta-trace update
  stage 7  full production kernel (+ per-step dynamic row store)

Run on a QUIET chip (queue drained) from /root/repo:
    python scripts/emit_ablation.py [--steps 20000] [--out PATH]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp


def time_variant(run, steps):
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    key = jax.random.key(0)
    jax.block_until_ready(run(key, theta0, steps))  # compile
    best = float("inf")
    for r in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jax.random.fold_in(key, r), theta0, steps))
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e6  # us/superstep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--out", default="artifacts/ess_paper_fused/emit_ablation.json")
    ap.add_argument("--cells", default="binary9,mp511")
    args = ap.parse_args()

    from pmpx.kernels import fused_chain as fc
    from pmpx.samplers.pmp import PMPConfig
    from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg

    x, y = make_synthetic_linreg(jax.random.key(0), 100_000)
    target = BayesLinReg(x, y, temper=0.05, method="fused")
    cells = {
        "binary9": PMPConfig(N=1, depth=9, step_size=0.05,
                             selection="all_first"),
        "mp511": PMPConfig(N=511, depth=1, step_size=0.05,
                           selection="all_first"),
    }
    results = {}
    for name in args.cells.split(","):
        cfg = cells[name]
        rows = {}
        run0 = fc.make_fused_chain(target, cfg, chunk=args.chunk,
                                   emit="root")
        rows["stage0_root"] = time_variant(run0, args.steps)
        print(f"{name} stage0_root: {rows['stage0_root']:.3f} us", flush=True)
        for k in range(1, 8):
            runk = fc.make_fused_chain(target, cfg, chunk=args.chunk,
                                       emit="all", _ablate=k)
            rows[f"stage{k}"] = time_variant(runk, args.steps)
            print(f"{name} stage{k}: {rows[f'stage{k}']:.3f} us", flush=True)
        results[name] = rows
    out = {
        "methodology": (
            "wall clock best-of-3 after an untimed compile call, "
            f"{args.steps} supersteps, chunk={args.chunk}, quiet chip; "
            "us per superstep; stages cumulative (see module docstring)"
        ),
        "cells": results,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
