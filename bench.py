"""Headline benchmark: PMP per-iteration time, P=1024 speculative states,
100k-point Bayesian linreg likelihood — the reference's north-star row
(README.md:48: PMP, 100000 data, P=1024 -> 42096.793 us GPU + 2041.279 us
host overhead per iteration on an A100; BASELINE.md).

Protocol parity: binary prefetch tree with 1024 nodes (the reference's
``100000_PMP.cu`` uses a binary tran_table), full O(P*n) likelihood sweep per
iteration via the Pallas kernel (same arithmetic as the CUDA kernel's
per-thread data loop), per-level transition weights, on-device categorical
resampling of all P states with draw 0 as next root (``conv_pmp.cu:226-259``
selection semantics).  Our host-overhead column is structurally zero: the
entire iteration loop lives in one jitted lax.scan.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the speedup factor over the A100 total (GPU + overhead).
"""

import json
import time

import jax
import jax.numpy as jnp

from pmpx import PMPConfig, run_chain
from pmpx.samplers import pmp
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg

# A100 baseline, README.md:48: GPU time + host/transfer overhead per iter (us)
BASELINE_US = 42096.793 + 2041.279

N_DATA = 100_000
DEPTH = 10  # binary tree -> P = 2**10 = 1024 speculative states
# long scans amortize the host->device dispatch quantum (~40 ms on the
# axon transport) to noise; the loop itself never touches the host
ITERS = 2000
REPEATS = 3


def main():
    backend = jax.default_backend()
    method = "pallas" if backend == "tpu" else "xla"
    x, y = make_synthetic_linreg(jax.random.key(0), N_DATA)
    # tempering parity with 100000_MP.cu:19 (likelihood / 1000)
    target = BayesLinReg(x, y, temper=1e-3, method=method)
    cfg = PMPConfig(
        N=1,
        depth=DEPTH,
        step_size=0.02,
        trans_sigma=1.0,
        selection="all_first",
    )
    superstep = pmp.make_superstep(target, cfg)
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)

    @jax.jit
    def run(key, theta):
        # record only the chosen root per iteration: the timing covers the
        # full superstep (tree gen, P*n likelihood sweep, tree-walk weights,
        # P-way resampling) with no host traffic inside the loop
        return run_chain(
            superstep,
            key,
            theta,
            ITERS,
            collect=lambda t, out: out["root_index"],
        )

    # warmup/compile
    run(jax.random.key(1), theta0)[0].block_until_ready()

    best = float("inf")
    for r in range(REPEATS):
        t0 = time.perf_counter()
        run(jax.random.key(2 + r), theta0)[0].block_until_ready()
        dt = time.perf_counter() - t0
        best = min(best, dt / ITERS * 1e6)

    print(
        json.dumps(
            {
                "metric": "pmp_p1024_n100k_us_per_iter",
                "value": round(best, 3),
                "unit": "us",
                "vs_baseline": round(BASELINE_US / best, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
