"""Profile the small-P fixed cost: device-op breakdown of the PMP
n=500 / P=4 superstep (the weakest cell of the headline table).

Usage: python scripts/profile_smallp.py [P] [n_data] [iters]
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from pmpx import tree
from pmpx.config import SamplerSpec
from pmpx.profiling import device_time_us, trace
from pmpx.samplers.base import run_chain
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg


def main():
    P = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n_data = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    method = sys.argv[4] if len(sys.argv) > 4 else "pallas"

    x, y = make_synthetic_linreg(jax.random.key(0), n_data)
    target = BayesLinReg(x, y, temper=0.1, method=method)
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    spec = SamplerSpec(
        algo="pmp", N=1, depth=tree.binary_depth(P), step_size=0.02,
        selection="all_first",
    )
    superstep = spec.build(target)
    f = jax.jit(
        lambda k, t: run_chain(
            superstep, k, t, iters, collect=lambda th, o: o["root_index"]
        )
    )
    f(jax.random.key(1), theta0)[1].block_until_ready()

    import time

    t0 = time.perf_counter()
    f(jax.random.key(2), theta0)[1].block_until_ready()
    wall = (time.perf_counter() - t0) / iters * 1e6
    print(f"wall us/iter: {wall:.2f}")

    log_dir = "/tmp/pmpx_prof_smallp"
    with trace(log_dir):
        f(jax.random.key(3), theta0)[1].block_until_ready()
    ops = device_time_us(log_dir)
    total = sum(ops.values())
    print(f"device total us/iter: {total / iters:.2f}  ({len(ops)} op names)")
    for name, us in sorted(ops.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {us / iters:8.3f} us/iter  {name}")


if __name__ == "__main__":
    main()
