"""Bayesian NN posterior sampling with a PMP-HMC speculation tree.

Run: python examples/bayesian_nn.py
(Uses the synthetic MNIST stand-in when no dataset is on disk.)
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
from pmpx.data import load_mnist
from pmpx.models import BayesMLP
from pmpx.samplers import hmc
from pmpx.targets.nn import NNPosterior

x_tr, y_tr, x_te, y_te = load_mnist(n_train=4096, n_test=1024)

posterior = NNPosterior(
    BayesMLP(hidden=64),
    x_tr,
    y_tr,
    init_key=jax.random.key(0),
    stochastic=True,  # torchbnn-style sampling forward
)

cfg = pmpx.PMPHMCConfig(
    depth=3,  # 8 speculative states per superstep
    step_size=0.1,
    mom_scale=0.0005,
    rule="barker_clamp",
)
superstep = hmc.make_superstep(posterior, cfg)

theta0 = posterior.init_theta()
loss = lambda th, o: -posterior.log_prob(th, key=jax.random.key(9))
thetaF, losses = jax.jit(
    lambda k, t: pmpx.run_chain(superstep, k, t, 100, collect=loss)
)(jax.random.key(1), theta0)

acc = jax.jit(
    lambda t: posterior.accuracy(t, x_te, y_te, key=jax.random.key(7))
)(thetaF)
print(f"loss: {float(losses[0]):.3f} -> {float(losses[-1]):.3f}")
print(f"test accuracy: {float(acc):.3f}")
