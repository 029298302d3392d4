"""MNIST posterior sampling: {FC, CNN, LSTM} x {MH, MP, PMP}.

Parity with ``complex_nets/Mnist/{FC,CNN,LSTM}/{MH,MP,PMP}_*.py``: full-batch
cross-entropy posterior, random-walk proposals with alpha=1e-4, z-score
weight standardization, single-draw selection, loss/accuracy trace dumps
with the reference naming convention.  The reference warm-starts from
SGD-pretrained ``.pkl`` checkpoints; ``pretrain_steps`` of Adam provides the
equivalent warm start here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pmpx.config import SamplerSpec
from pmpx.data import load_mnist
from pmpx.metrics.recorder import reference_style_name, save_trace
from pmpx.models import MnistCNN, MnistLSTM, MnistMLP, PackedMnistCNN
from pmpx.samplers.base import run_chain
from pmpx.targets.nn import NNPosterior

# CNN defaults to the plain flax module (NHWC): measured on v5e, XLA's
# own conv layouts beat the hand-packed executor ~4-10x in us/superstep
# AND in compiled memory (artifacts/nn_perf) — layout="packed" keeps the
# channel-packed executor (pmpx.models.packed) available as the measured
# alternative.
MODELS = {
    "FC": lambda layout: MnistMLP(),
    "CNN": lambda layout: (
        PackedMnistCNN() if layout == "packed" else MnistCNN()
    ),
    "LSTM": lambda layout: MnistLSTM(),
}


def sampler_spec(algo: str, alpha: float, N: int) -> SamplerSpec:
    """The MNIST zoo's sampler configuration ({MH,MP,PMP}_*.py protocol:
    alpha random walk, single-draw selection, z-score stabilization).
    Shared with nn_perf so the benchmarked superstep IS the zoo's."""
    if algo == "mh":
        return SamplerSpec(algo="mh", step_size=alpha)
    # reference convention: N means N+1 states in a binary tree
    return SamplerSpec.reference_nn(
        algo, N, step_size=alpha, selection="single",
        stabilizer="zscore",
    )


def pretrain(target: NNPosterior, steps: int, lr: float = 1e-3):
    """Adam warm start (stand-in for the reference's pretrained .pkl)."""
    if steps <= 0:
        return target.init_theta()
    opt = optax.adam(lr)

    @jax.jit
    def step(theta, state, X):
        with target.bound_data(X):
            loss, g = jax.value_and_grad(
                lambda t: -target.log_prob(t)
            )(theta)
        upd, state = opt.update(g, state)
        return optax.apply_updates(theta, upd), state

    theta = target.init_theta()
    state = opt.init(theta)
    for _ in range(steps):
        theta, state = step(theta, state, target.X)
    return theta


def run(
    model: str = "FC",
    algo: str = "pmp",
    alpha: float = 1e-4,
    N: int = 7,
    num_steps=None,
    n_train=None,
    n_test=None,
    pretrain_steps: int = 50,
    temper=None,
    seed: int = 0,
    out_dir: str = "results/mnist",
    scale: str = "smoke",
    class_sep: float = 1.5,
    label_noise: float = 0.0,
    proposal_chunk=None,
    warm_start: str = "",
    layout: str = "nhwc",
    compute_dtype: str = "",
    chunk_steps=None,
    resume: bool = False,
    lstm_kernel: bool = False,
    cnn_kernel: bool = False,
):
    """``chunk_steps``: run the chain as checkpointed device calls of
    that many supersteps (``pmpx.checkpoint.resume_chain``) instead of
    one monolithic scan — required at paper scale, where a single 500k-
    step device execution outlives what the remote TPU transport
    tolerates (observed worker crash ~3 min into a monolithic scan), and
    it makes the reference-protocol runs crash-resumable (``resume=True``
    continues from the checkpoint)."""
    if temper is None:
        # the reference tempers each algo differently: MH_FC.py:81,99
        # accepts with exp(lamb*(CE/10 - CE'/10)), lamb=10000 — an
        # effective log pi = -1000*CE, which is what keeps its MH near
        # the warm start; MP/PMP use exp(-CE/10) per state
        # (PMP_FC.py:44,117) whose final logits are then z-scored.  For
        # MH the scale IS the sampler, so default to the reference's
        # 1000.  For MP/PMP we keep 10 (the r2 artifact-pinned value):
        # the z-score makes the final selection logits scale-invariant,
        # and the remaining effect (per-level Barker sharpness) is a
        # documented divergence from the reference's effective 0.1.
        temper = 1000.0 if algo == "mh" else 10.0
    if scale == "paper":
        # the reference's per-model step counts: FC 500k (PMP_FC.py),
        # CNN 250k (PMP_CNN.py), LSTM 1M (PMP_LSTM.py).  An explicit
        # num_steps still wins — prefix runs at an honest step count
        # (embedded in the trace name) when full scale exceeds a round's
        # chip budget.
        # explicit n_train/n_test still win (e.g. rate probes at the
        # paper tempering/chunking but a shrunken batch)
        n_train = 60000 if n_train is None else n_train
        n_test = 10000 if n_test is None else n_test
        if num_steps is None:
            num_steps = {
                "FC": 500000, "CNN": 250000, "LSTM": 1000000,
            }[model]
        if chunk_steps is None:
            # one device call ~30 s at the measured full-batch
            # ms/superstep (FC ~4.5, CNN ~80 bf16, LSTM ~156;
            # CLAUDE.md: calls past ~60 s crash the remote TPU worker)
            chunk_steps = {
                "FC": 5000, "CNN": 250, "LSTM": 200,
            }[model]
    else:
        n_train = 4096 if n_train is None else n_train
        n_test = 1024 if n_test is None else n_test
        if num_steps is None:
            num_steps = 300
    x_tr, y_tr, x_te, y_te = load_mnist(
        n_train=n_train, n_test=n_test, class_sep=class_sep,
        label_noise=label_noise,
    )
    target = NNPosterior(
        MODELS[model](layout), x_tr, y_tr, temper=temper,
        init_key=jax.random.key(seed),
        proposal_chunk=proposal_chunk,
        compute_dtype=jnp.bfloat16 if compute_dtype == "bf16" else None,
    )
    if lstm_kernel and model != "LSTM":
        raise ValueError("--lstm-kernel requires --model LSTM")
    if cnn_kernel and (model != "CNN" or layout != "nhwc"):
        raise ValueError("--cnn-kernel requires --model CNN (nhwc)")
    if warm_start:
        # seed from a torch checkpoint, e.g. the reference's own committed
        # FC_model.pkl / CNN_model.pkl / LSTM_model.pkl (PMP_FC.py:188-189)
        from pmpx.interop import load_torch_pickle, theta_from_torch_state

        theta0 = theta_from_torch_state(
            target, load_torch_pickle(warm_start)
        )
    else:
        theta0 = pretrain(target, pretrain_steps)

    if lstm_kernel:
        # fused Pallas forward: the whole 28-step recurrence + all P
        # speculative parameter sets in one kernel, VMEM-resident
        # carries (pmpx/kernels/lstm_fused.py).  Attached AFTER
        # pretrain (which differentiates log_prob; the kernel is
        # forward-only) — the MTM supersteps themselves are
        # gradient-free.  Density rounding differs from the XLA path
        # (float reassociation), so this is a protocol field — prefix
        # adoption must never splice kernel and XLA runs.
        from pmpx.kernels import lstm_fused

        lstm_fused.attach(target)

    if cnn_kernel:
        # MXU-shaped CNN forward (space-to-depth conv1 + phase-max pool
        # + proposal-grouped conv2, pmpx/kernels/cnn_fast.py).  Same
        # contract as lstm_kernel: forward-only, attached after
        # pretrain, and a protocol field — kernel-path and XLA-path
        # chains must never splice (float reassociation changes the
        # density rounding that acceptance weights compare).
        from pmpx.kernels import cnn_fast

        cnn_fast.attach(target)

    superstep = sampler_spec(algo, alpha, N).build(target)
    # CE loss of the chosen state, from the superstep's own density
    # evaluation (no re-evaluation of the full batch per step)
    loss_of = lambda th, o: -o["root_logp"] / target.temper

    name = reference_style_name(
        algo.upper(), alpha, num_steps, model=model, N=N
    )
    steady_ms = None
    if chunk_steps:
        import os

        from pmpx.checkpoint import (
            TraceAccumulator, adopt_prefix_run, resume_chain,
            save_checkpoint, write_protocol_sidecar,
        )

        # everything that changes the posterior or the chain WITHOUT
        # changing the stem (adopt_prefix_run must never splice these)
        protocol = {
            "temper": float(temper),
            "n_train": int(n_train), "n_test": int(n_test),
            "class_sep": float(class_sep),
            "label_noise": float(label_noise),
            "seed": int(seed),
            "compute_dtype": compute_dtype,
            # present only when on: pre-existing sidecars (all XLA-path)
            # must keep matching, and a kernel run must never splice
            # onto an XLA-path prefix (different density rounding)
            **({"lstm_kernel": True} if lstm_kernel else {}),
            **({"cnn_kernel": True} if cnn_kernel else {}),
            "layout": layout,
            "warm_start": warm_start or None,
            "pretrain_steps": None if warm_start else int(pretrain_steps),
        }
        ckpt = os.path.join(out_dir, f"{name}.ckpt")
        if resume and not os.path.exists(ckpt):
            # extending a prefix run (same protocol, larger num_steps):
            # the stem embeds num_steps, so adopt the longest sibling
            # prefix instead of re-running it from step 0
            adopted = adopt_prefix_run(
                out_dir,
                lambda s: reference_style_name(
                    algo.upper(), alpha, s, model=model, N=N
                ),
                num_steps,
                keys=("loss",),
                protocol=protocol,
            )
            if adopted is not None:
                print(f"adopted {adopted}-step prefix run as resume seed")
        fresh = not (resume and os.path.exists(ckpt))
        # per-chunk disk accumulation: a resumed run (which only returns
        # post-crash chunks) still ends with the full-history trace
        acc = TraceAccumulator(out_dir, name, ("loss",), fresh=fresh)
        if fresh:
            save_checkpoint(ckpt, theta0, jax.random.key(seed + 1), 0)
            write_protocol_sidecar(out_dir, name, protocol)

        thetaF, _ = resume_chain(
            superstep, ckpt, num_steps, collect=loss_of,
            checkpoint_every=chunk_steps, on_chunk=acc,
            # dataset as a jit argument, not a 188 MB HLO constant
            bind=target.bound_data, bind_args=(x_tr,),
        )
        losses = acc.load("loss")
        steady = acc.steady_s_per_step(chunk_steps)
        steady_ms = None if steady is None else steady * 1e3
    else:
        @jax.jit
        def run_fn(k, t, X):
            # dataset as a jit argument (not an embedded HLO constant)
            with target.bound_data(X):
                return run_chain(
                    superstep, k, t, num_steps, collect=loss_of
                )

        thetaF, losses = run_fn(jax.random.key(seed + 1), theta0, x_tr)
        losses = np.asarray(losses)
    acc_tr = float(jax.jit(target.accuracy)(thetaF, x_tr, y_tr))
    acc_te = float(jax.jit(target.accuracy)(thetaF, x_te, y_te))
    meta = {
        "model": model,
        "train_acc": acc_tr,
        "test_acc": acc_te,
        "num_steps": num_steps,
    }
    if steady_ms is not None:
        meta["steady_ms_per_superstep"] = steady_ms
    save_trace(out_dir, name, {"loss": losses}, meta)
    out = {
        "loss_first": float(losses[0]),
        "loss_last": float(losses[-1]),
        "train_acc": acc_tr,
        "test_acc": acc_te,
    }
    if steady_ms is not None:
        out["steady_ms_per_superstep"] = steady_ms
    return out
