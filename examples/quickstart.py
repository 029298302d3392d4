"""Quickstart: sample a banana distribution with PMP and diagnose it.

Run: python examples/quickstart.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import sys
from pathlib import Path

try:
    import pmpx  # installed
except ModuleNotFoundError:  # running from a source checkout
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import pmpx
from pmpx.metrics import ess_per_dim, msjd
from pmpx.samplers import pmp
from pmpx.targets import Banana

# 16 speculative states per superstep: 3 proposals/node, 2 levels deep
cfg = pmpx.PMPConfig(N=3, depth=2, step_size=0.7)
superstep = pmp.make_superstep(Banana(), cfg)

theta, recs = jax.jit(
    lambda k, t: pmpx.run_chain(superstep, k, t, 10_000)
)(jax.random.key(0), jnp.array([0.0, -8.0], jnp.float32))

samples = np.asarray(recs["samples"]).reshape(-1, 2)[32_000:]
print(f"samples: {samples.shape}")
print(f"E[x1] = {samples[:, 0].mean():+.3f}   (analytic 0)")
print(f"E[x2] = {samples[:, 1].mean():+.3f}   (analytic -8)")
print(f"ESS per dim: {np.asarray(ess_per_dim(jnp.asarray(samples)))}")
print(f"MSJD: {float(msjd(jnp.asarray(samples))):.4f}")
