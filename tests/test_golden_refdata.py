"""Golden run on the reference's own committed dataset.

``/root/reference/simple_net/MH_MP_PMP_Compare_convergence/data_{x,y}.txt``
are the exact 100k points behind every CUDA convergence/timing number
(read by ``conv_mp.cu:62-79``).  Running our samplers on identical bytes
makes beta-recovery directly comparable to the reference's committed
traces (``par_conv_analy.ipynb``): OLS on this file gives
beta0=-0.9985, beta1=1.9965, sigma=0.4996, and the reference's tempered
(/2000) chains wander ~+-0.1 around those values.
"""

import os

import numpy as np
import pytest

REF_DIR = "/root/reference/simple_net/MH_MP_PMP_Compare_convergence"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REF_DIR, "data_x.txt")),
    reason="reference checkout not mounted",
)


@pytest.fixture(scope="module")
def ref_xy():
    from pmpx.experiments.convergence import load_reference_data

    return load_reference_data(REF_DIR)


def test_reference_dataset_shape_and_ols(ref_xy):
    x, y = map(np.asarray, ref_xy)
    assert x.shape == y.shape == (100000,)
    A = np.stack([np.ones_like(x), x], 1)
    b, *_ = np.linalg.lstsq(A, y, rcond=None)
    # the generative truth the reference recovers (lb.py:12-14)
    assert abs(b[0] - (-1.0)) < 0.02
    assert abs(b[1] - 2.0) < 0.02
    assert abs((y - A @ b).std() - 0.5) < 0.02


@pytest.mark.parametrize("algo", ["mp", "pmp"])
def test_beta_recovery_on_reference_bytes(ref_xy, algo):
    """conv_{mp,pmp}.cu protocol (tempering /2000, N=7, PMP depth 3,
    all-logged selection with draw 0 as next root) recovers the
    generative parameters within the reference's own trace spread."""
    import jax
    import jax.numpy as jnp

    from pmpx.config import SamplerSpec
    from pmpx.samplers.base import run_chain
    from pmpx.targets.linreg import BayesLinReg

    x, y = ref_xy
    target = BayesLinReg(x, y, temper=1.0 / 2000.0, method="fused")
    spec = SamplerSpec(
        algo=algo, N=7, depth=3, step_size=0.02, selection="all_first"
    )
    superstep = spec.build(target)
    steps = 700
    _, roots = jax.jit(
        lambda k, t: run_chain(superstep, k, t, steps, collect=lambda th, o: th)
    )(jax.random.key(3), jnp.array([0.0, 0.0, 1.0], jnp.float32))
    tail = np.asarray(roots)[steps // 2 :]
    # tempered-posterior sd is ~0.07-0.12 per coordinate; 0.25 is well
    # inside "converged to the basin" but far from the (0, 0, 1) start
    assert abs(tail[:, 0].mean() - (-1.0)) < 0.25
    assert abs(tail[:, 1].mean() - 2.0) < 0.25
    assert abs(np.abs(tail[:, 2]).mean() - 0.5) < 0.2
