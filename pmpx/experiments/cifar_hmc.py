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
    num_steps=None,
    n_train=None,
    n_test=None,
    pretrain_steps: int = 30,
    seed: int = 0,
    out_dir: str = "results/cifar",
    scale: str = "smoke",
    warm_start: str = "",
    class_sep: float = 1.5,
    label_noise: float = 0.0,
    layout: str = "nhwc",
    remat: bool = False,
    proposal_chunk=None,
    compute_dtype: str = "",
    chunk_steps=None,
    resume: bool = False,
):
    """``scale="paper"`` is the reference's committed protocol: full-batch
    50000 train / 10000 test, 50,000 supersteps (the committed
    ``Cifar-10/{MP,PMP,SP}/*.npy`` traces are shape (50000,)), loss +
    train-acc + test-acc recorded every superstep (``cifar_PMPhmc.py:
    164-170``).  ``chunk_steps`` runs the chain as checkpointed device
    calls (``pmpx.checkpoint.resume_chain``) — required at paper scale,
    where one monolithic 50k-step device execution outlives the remote
    TPU transport; ``resume=True`` continues from the checkpoint."""
    if scale == "paper":
        # explicit n_train/n_test still win (shrunken-batch rate probes)
        n_train = 50000 if n_train is None else n_train
        n_test = 10000 if n_test is None else n_test
        if num_steps is None:
            num_steps = 50000
        if chunk_steps is None:
            # sized per algo so one device call stays ~30 s at the
            # measured full-batch ms/superstep (sp ~59, pmp ~216,
            # mp ~383 bf16; CLAUDE.md: calls past ~60 s crash the
            # remote TPU worker and wedge the grant for 25-55 min)
            chunk_steps = {"sp_hmc": 500, "pmp_hmc": 125, "mp_hmc": 75}[
                algo
            ]
    else:
        n_train = 2048 if n_train is None else n_train
        n_test = 512 if n_test is None else n_test
        if num_steps is None:
            num_steps = 10
    x_tr, y_tr, x_te, y_te = load_cifar10(
        n_train=n_train, n_test=n_test, class_sep=class_sep,
        label_noise=label_noise,
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
    name = f"cifar_{algo}"
    meta = {"N": N, "num_steps": num_steps}

    if chunk_steps:
        import contextlib
        import os

        from pmpx.checkpoint import (
            TraceAccumulator, resume_chain, save_checkpoint,
        )

        ckpt = os.path.join(out_dir, f"{name}.ckpt")
        fresh = not (resume and os.path.exists(ckpt))
        acc = TraceAccumulator(
            out_dir, name, ("loss", "train_acc", "test_acc"), fresh=fresh
        )
        if fresh:
            save_checkpoint(ckpt, theta0, jax.random.key(seed + 1), 0)

        held = {}

        @contextlib.contextmanager
        def bind(X_tr, X_te):
            # both datasets as jit arguments: full-scale CIFAR (600 MB
            # train + 123 MB test) embedded as HLO constants exceeds the
            # remote-compile transport; the test split rides through a
            # trace-time stash read by collect below
            with target.bound_data(X_tr):
                held["x_te"] = X_te
                try:
                    yield
                finally:
                    held.pop("x_te", None)

        def collect(theta, out):
            return (
                -target.log_prob(theta),
                target.accuracy(theta),
                target.accuracy(theta, held["x_te"], y_te),
            )

        resume_chain(
            superstep, ckpt, num_steps, collect=collect,
            checkpoint_every=chunk_steps, on_chunk=acc,
            bind=bind, bind_args=(x_tr, x_te),
        )
        arrays = {k: acc.load(k) for k in acc.keys}
        steady = acc.steady_s_per_step(chunk_steps)
        if steady is not None:
            meta["steady_ms_per_superstep"] = steady * 1e3
    else:
        @jax.jit
        def run_fn(k, t, X_tr, X_te):
            # datasets as jit arguments: full-scale CIFAR (600 MB)
            # embedded as HLO constants exceeds remote-compile limits
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
    save_trace(out_dir, name, arrays, meta)
    out = {
        "loss_first": float(arrays["loss"][0]),
        "loss_last": float(arrays["loss"][-1]),
        "test_acc_last": float(arrays["test_acc"][-1]),
    }
    if "steady_ms_per_superstep" in meta:
        out["steady_ms_per_superstep"] = meta["steady_ms_per_superstep"]
    return out
