"""Data-sharded NN posterior == unsharded NNPosterior (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from pmpx.models import LeNet, MnistMLP, PackedLeNet
from pmpx.parallel.mesh import AXIS_DATA, make_mesh
from pmpx.parallel.sharded_nn import ShardedNNPosterior
from pmpx.targets.nn import NNPosterior

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _setup(model_cls, shape, n=64, seed=0):
    x = jax.random.normal(jax.random.key(seed), (n,) + shape)
    y = jax.random.randint(jax.random.key(seed + 1), (n,), 0, 10)
    t = NNPosterior(model_cls(), x, y, init_key=jax.random.key(2))
    return t, x, y


@pytest.mark.parametrize(
    "model_cls,shape",
    [
        (MnistMLP, (28, 28)),
        # LeNet = the default NHWC layout (flax BatchNorm sync-BN via
        # axis_name); PackedLeNet = the packed alternative's mask-aware BN
        (LeNet, (32, 32, 3)),
        (PackedLeNet, (32, 32, 3)),
    ],
)
def test_sharded_nn_density_and_grad_match(model_cls, shape):
    t, x, y = _setup(model_cls, shape)
    Theta = jnp.stack(
        [t.init_theta(), 0.95 * t.init_theta(), 1.1 * t.init_theta()]
    )
    want_v = np.asarray(jax.jit(t.log_prob_batch)(Theta))
    wv, wg = jax.jit(t.value_and_grad_batch)(Theta)

    mesh = make_mesh(chains=1, data=4)

    @jax.jit
    def sharded(x, y, Theta):
        def body(x_l, y_l, Th):
            s = ShardedNNPosterior.from_posterior(
                t, x_l, y_l, n_total=x.shape[0]
            )
            v = s.log_prob_batch(Th)
            v2, g2 = s.value_and_grad_batch(Th)
            acc = s.accuracy(Th[0])
            return v, v2, g2, acc

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(AXIS_DATA), P(AXIS_DATA), P()),
            out_specs=(P(), P(), P(), P()),
            check_vma=False,
        )(x, y, Theta)

    v, v2, g2, acc = sharded(x, y, Theta)
    np.testing.assert_allclose(np.asarray(v), want_v, rtol=2e-5,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(wv),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(wg),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(
        float(acc), float(jax.jit(t.accuracy)(Theta[0])), rtol=1e-6
    )


def test_sharded_nn_superstep_runs():
    """A PMP superstep over the sharded NN posterior executes SPMD (the
    multi-chip path for the reference's MNIST zoo)."""
    from pmpx.config import SamplerSpec
    from pmpx.samplers.base import run_chain

    t, x, y = _setup(MnistMLP, (28, 28), n=32, seed=5)
    mesh = make_mesh(chains=1, data=4)
    spec = SamplerSpec(algo="pmp", N=1, depth=2, step_size=1e-3,
                       selection="single", stabilizer="zscore")

    @jax.jit
    def run_sharded(x, y, key, theta0):
        def body(x_l, y_l, k, t0):
            s = ShardedNNPosterior.from_posterior(
                t, x_l, y_l, n_total=x.shape[0]
            )
            superstep = spec.build(s)
            return run_chain(superstep, k, t0, 3)[0]

        return shard_map(
            body, mesh=mesh,
            in_specs=(P(AXIS_DATA), P(AXIS_DATA), P(), P()),
            out_specs=P(),
            check_vma=False,
        )(x, y, key, theta0)

    out = run_sharded(x, y, jax.random.key(3), t.init_theta())
    assert np.isfinite(np.asarray(out)).all()
