"""CIFAR-10 LeNet posterior via HMC-flavored samplers.

Parity with ``complex_nets/Cifar-10/cifar_{SP,MP,PMP}hmc.py``: full-batch
CE posterior over LeNet, momentum scale 0.0005, leapfrog step 0.1, N=7
(PMP depth 3), loss/train-acc/test-acc traces saved per run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.config import SamplerSpec
from pmpx.data import load_cifar10
from pmpx.experiments.mnist import pretrain
from pmpx.metrics.recorder import save_trace
from pmpx.models import LeNet, PackedLeNet
from pmpx.samplers.base import run_chain
from pmpx.targets.nn import NNPosterior


def sampler_spec(algo: str, N: int, step_size: float,
                 mom_scale: float) -> SamplerSpec:
    """The CIFAR zoo's sampler configuration (cifar_{SP,MP,PMP}hmc.py
    protocol).  Shared with nn_perf so the benchmarked superstep IS the
    zoo's.  The reference's "N" means N+1 speculative states in a binary
    tree; SamplerSpec.reference_nn encodes that convention."""
    return SamplerSpec.reference_nn(
        algo, N,
        step_size=step_size,
        mom_scale=mom_scale,
        rule="mh_clamp" if algo == "pmp_hmc" else None,
        accept_scale=1000.0 if algo == "sp_hmc" else 1.0,
    )


def run(
    algo: str = "pmp_hmc",  # sp_hmc | mp_hmc | pmp_hmc
    N: int = 7,
    step_size: float = 0.1,
    mom_scale: float = 0.0005,
    num_steps: int = 10,
    n_train: int = 2048,
    n_test: int = 512,
    pretrain_steps: int = 30,
    seed: int = 0,
    out_dir: str = "results/cifar",
    scale: str = "smoke",
    warm_start: str = "",
    class_sep: float = 1.5,
    layout: str = "nhwc",
    remat: bool = False,
    proposal_chunk=None,
    compute_dtype: str = "",
):
    if scale == "paper":
        n_train, n_test = 50000, 10000
    x_tr, y_tr, x_te, y_te = load_cifar10(
        n_train=n_train, n_test=n_test, class_sep=class_sep
    )
    # NHWC (plain flax) measured ~10x faster and ~2x leaner than the
    # channel-packed executor on v5e (artifacts/nn_perf); layout="packed"
    # keeps the alternative.  compute_dtype="bf16" is the measured lever
    # for full-P concurrency at full batch (25.7 -> 14.8 GiB grad
    # program); remat is kept but measured peak-neutral on TPU.
    model = (
        PackedLeNet() if layout == "packed" else LeNet(remat=remat)
    )
    target = NNPosterior(
        model, x_tr, y_tr, init_key=jax.random.key(seed),
        proposal_chunk=proposal_chunk,
        compute_dtype=jnp.bfloat16 if compute_dtype == "bf16" else None,
    )
    if warm_start:
        # seed from a torch checkpoint, e.g. the reference's committed
        # cifar.pkl LeNet warm start (cifar_PMPhmc.py:175-176)
        from pmpx.interop import load_torch_pickle, theta_from_torch_state

        theta0 = theta_from_torch_state(
            target, load_torch_pickle(warm_start)
        )
    else:
        theta0 = pretrain(target, pretrain_steps)

    superstep = sampler_spec(algo, N, step_size, mom_scale).build(target)

    @jax.jit
    def run_fn(k, t, X_tr, X_te):
        # datasets as jit arguments: full-scale CIFAR (600 MB) embedded
        # as HLO constants exceeds remote-compile transport limits
        with target.bound_data(X_tr):
            def collect(theta, out):
                loss = -target.log_prob(theta)
                acc_tr = target.accuracy(theta)
                acc_te = target.accuracy(theta, X_te, y_te)
                return loss, acc_tr, acc_te

            return run_chain(
                superstep, k, t, num_steps, collect=collect
            )

    _, (losses, acc_tr, acc_te) = run_fn(
        jax.random.key(seed + 1), theta0, x_tr, x_te
    )
    arrays = {
        "loss": np.asarray(losses),
        "train_acc": np.asarray(acc_tr),
        "test_acc": np.asarray(acc_te),
    }
    save_trace(out_dir, f"cifar_{algo}", arrays, {"N": N})
    return {
        "loss_first": float(arrays["loss"][0]),
        "loss_last": float(arrays["loss"][-1]),
        "test_acc_last": float(arrays["test_acc"][-1]),
    }
