"""NN-zoo performance table + packed-layout memory footprints (TPU).

Two measurements the reference never makes but whose workloads it defines:

* ``footprint``: compiled peak-memory analysis of the batched LeNet
  gradient program across layouts (NHWC, hand-packed) and memory levers
  (conv-block remat, bf16 activations) — the numbers that decide whether
  full-batch image posteriors (``cifar_PMPhmc.py`` full 50k CIFAR,
  ``PMP_CNN.py`` full 60k MNIST) fit one chip and at what proposal
  parallelism.  These measurements are how the round-1 "NHWC lane
  padding" hypothesis was disproved (see ``pmpx/models/packed.py``).
* ``table``: measured us/superstep for every NN-zoo cell at reference
  scale — MNIST {FC, CNN, LSTM} x {MH, MP, PMP} (``complex_nets/Mnist``)
  and CIFAR LeNet {SP, MP, PMP}-HMC (``complex_nets/Cifar-10``) — the
  per-iteration column the reference reports as wall-clock per step in
  its paper tables.

Timing uses one jitted ``lax.scan`` of ``iters`` supersteps (dispatch
wall-clock through remote transports is quantized; amortization is the
honest measurement, see CLAUDE.md).
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.config import SamplerSpec
from pmpx.data import load_cifar10, load_mnist
from pmpx.models import (
    LeNet,
    MnistCNN,
    PackedLeNet,
    PackedMnistCNN,
)
from pmpx.profiling import superstep_timer
from pmpx.samplers.base import run_chain
from pmpx.targets.nn import NNPosterior
# the benchmarked supersteps ARE the zoo experiments' own: one shared
# spec builder per zoo (drift between "what we time" and "what we run"
# is impossible by construction)
from pmpx.experiments.cifar_hmc import sampler_spec as _cifar_spec
from pmpx.experiments.mnist import MODELS as MNIST_MODELS
from pmpx.experiments.mnist import sampler_spec as _mnist_spec


def _mem_stats(target, method_name: str, theta_spec):
    """Compile the target's batched method (data threaded as a jit
    argument via ``bound_data``) and return its memory analysis (bytes).
    Compile-only: programs too big to *run* still report their would-be
    footprint."""

    def g(X, Theta):
        with target.bound_data(X):
            return getattr(target, method_name)(Theta)

    x_spec = jax.ShapeDtypeStruct(target.X.shape, target.X.dtype)
    try:
        compiled = jax.jit(g).lower(x_spec, theta_spec).compile()
    except Exception as e:  # TPU AOT refuses over-HBM programs outright
        import re

        m = re.search(
            r"Used ([\d.]+)G of ([\d.]+)G hbm", str(e)
        )
        out = {"compile_oom": True}
        if m:
            out["hbm_needed_gib"] = float(m.group(1))
            out["hbm_capacity_gib"] = float(m.group(2))
            out["peak_gib"] = float(m.group(1))
        else:
            # best-effort parse missed (XLA error phrasing drifted?):
            # keep the raw message so the drift is visible in the
            # artifact instead of silently dropping the hbm fields
            out["oom_error_unparsed"] = str(e)[:500]
        return out
    mem = compiled.memory_analysis()
    out = {}
    for k in (
        "temp_size_in_bytes",
        "argument_size_in_bytes",
        "output_size_in_bytes",
        "alias_size_in_bytes",
    ):
        v = getattr(mem, k, None)
        if v is not None:
            out[k] = int(v)
    out["peak_gib"] = round(
        (out.get("temp_size_in_bytes", 0)
         + out.get("argument_size_in_bytes", 0)) / 2**30, 3
    )
    return out


def _lenet_target(layout: str, x, y, proposal_chunk=None,
                  remat=False, compute_dtype=None):
    model = LeNet(remat=remat) if layout == "nhwc" else PackedLeNet()
    return NNPosterior(
        model, x, y, init_key=jax.random.key(0),
        proposal_chunk=proposal_chunk, compute_dtype=compute_dtype,
    )


def footprint(P: int = 8, n_train: int = 50000, class_sep: float = 1.5):
    """Peak compiled memory of the P-proposal LeNet grad program, by
    layout and memory lever.  At full scale the unchunked P=8 programs
    are rejected outright by the TPU AOT compiler (``compile_oom``) —
    the question each variant answers is how far remat/bf16/packing move
    that ceiling."""
    x, y, _, _ = load_cifar10(n_train=n_train, n_test=8,
                              class_sep=class_sep)
    out = {"P": P, "n_train": n_train, "backend": jax.default_backend()}
    variants = {
        "nhwc": {},
        "packed": {},
        # the memory levers that decide how many full-batch conv grads
        # fit concurrently: block remat (residuals shrink to post-pool
        # boundaries) and bf16 activations (f32 loss/grads)
        "nhwc_remat": {"remat": True},
        "nhwc_bf16": {"compute_dtype": jnp.bfloat16},
        "nhwc_remat_bf16": {"remat": True,
                            "compute_dtype": jnp.bfloat16},
    }
    for name, kw in variants.items():
        layout = "packed" if name == "packed" else "nhwc"
        t = _lenet_target(layout, x, y, **kw)
        theta = jax.ShapeDtypeStruct((P, t.d), jnp.float32)
        out[f"lenet_grad_{name}"] = _mem_stats(
            t, "value_and_grad_batch", theta
        )
    # the configurations that actually run long chains: chunked, by layout
    for layout in ("nhwc", "packed"):
        t = _lenet_target(layout, x, y, proposal_chunk=1)
        theta = jax.ShapeDtypeStruct((P, t.d), jnp.float32)
        out[f"lenet_grad_{layout}_chunk1"] = _mem_stats(
            t, "value_and_grad_batch", theta
        )
    a = out["lenet_grad_nhwc"].get("peak_gib")
    b = out["lenet_grad_packed"].get("peak_gib")
    if a and b:
        out["nhwc_over_packed"] = round(a / b, 2)
    # quarter-scale pair where both layouts compile: the clean ratio
    n4 = max(n_train // 4, 64)
    out["quarter"] = {"n_train": n4}
    for layout in ("nhwc", "packed"):
        t = _lenet_target(layout, x[:n4], y[:n4])
        theta = jax.ShapeDtypeStruct((P, t.d), jnp.float32)
        out["quarter"][f"lenet_grad_{layout}"] = _mem_stats(
            t, "value_and_grad_batch", theta
        )
    a = out["quarter"]["lenet_grad_nhwc"].get("peak_gib")
    b = out["quarter"]["lenet_grad_packed"].get("peak_gib")
    if a and b:
        out["quarter"]["nhwc_over_packed"] = round(a / b, 2)
    return out


def _time_cell(target, spec: SamplerSpec, iters: int) -> float:
    superstep = spec.build(target)
    theta0 = target.init_theta()

    @jax.jit
    def run(k, t, X):
        # data as a jit argument, not a 600 MB embedded HLO constant
        with target.bound_data(X):
            return run_chain(superstep, k, t, iters)[0]

    return superstep_timer(
        run, jax.random.key(1), theta0, target.X, iters=iters
    )


def table(
    iters: int = 20,
    N: int = 7,
    alpha: float = 1e-4,
    n_mnist: int = 60000,
    n_cifar: int = 50000,
    proposal_chunk=None,
    cnn_chunk=2,
    cifar_chunk=1,
    class_sep: float = 1.5,
    only: str | None = None,
    on_cell=None,
):
    """us/superstep for each NN-zoo cell at reference batch sizes.

    Conv cells bound concurrent proposals (even packed, 8 full-batch conv
    grads exceed one chip's HBM); ``proposal_chunk`` overrides per-cell
    defaults when set.

    ``only``: comma-separated fnmatch patterns over cell names — skip
    non-matching cells (a wedged-device run can be finished cell-by-cell
    in fresh processes).  ``on_cell(name, value)``: incremental-
    persistence hook — a TPU "device error" wedges the whole grant, so
    every cell measured before the wedge must already be on disk.
    """
    from fnmatch import fnmatch

    cells = {}
    pats = [p for p in (only or "").split(",") if p]

    def _cell(name, make_target, spec):
        if pats and not any(fnmatch(name, p) for p in pats):
            return
        try:
            cells[name] = round(_time_cell(make_target(), spec, iters), 1)
        except Exception as e:  # record the failure, keep measuring
            cells[name] = f"error: {str(e)[:200]}"
        if on_cell is not None:
            on_cell(name, cells[name])

    x, y, _, _ = load_mnist(n_train=n_mnist, n_test=8,
                            class_sep=class_sep)
    for model in ("FC", "CNN", "LSTM"):
        chunk = proposal_chunk or (
            cnn_chunk if model == "CNN" else None
        )
        # nhwc is the measured winner and the default (suffix-free);
        # the packed cells document the alternative's cost
        layouts = ("nhwc", "packed") if model == "CNN" else ("nhwc",)
        for layout in layouts:
            mk = lambda m=model, lo=layout, c=chunk: NNPosterior(
                MNIST_MODELS[m](lo), x, y, temper=10.0,
                init_key=jax.random.key(0), proposal_chunk=c,
            )
            suffix = "" if layout == "nhwc" else "_packed"
            for algo in ("mh", "mp", "pmp"):
                _cell(f"mnist_{model}_{algo}{suffix}", mk,
                      _mnist_spec(algo, alpha, N))
    xc, yc, _, _ = load_cifar10(n_train=n_cifar, n_test=8,
                                class_sep=class_sep)
    for layout in ("nhwc", "packed"):
        mk = lambda lo=layout: _lenet_target(
            lo, xc, yc, proposal_chunk=proposal_chunk or cifar_chunk
        )
        suffix = "" if layout == "nhwc" else "_packed"
        for algo in ("sp_hmc", "mp_hmc", "pmp_hmc"):
            _cell(f"cifar_{algo}{suffix}", mk,
                  _cifar_spec(algo, N, 0.1, 0.0005))
    return cells


def bf16_delta(
    iters: int = 32,
    N: int = 7,
    n_mnist: int = 60000,
    n_cifar: int = 50000,
    class_sep: float = 1.5,
    only: str | None = None,
    on_cell=None,
):
    """Quantify the bf16 acceptance perturbation per image cell.

    For each cell, ``iters`` independent supersteps are taken from the
    SAME warm state with the SAME keys under f32 and bf16 compute; the
    study reports the move rate (the tree samplers' acceptance analog)
    under each dtype and the mean |delta log-accept-weight|.  For the
    random-walk cells the proposals are key-identical, so the delta is
    purely the density perturbation; for the HMC cells bf16 gradients
    also move the proposals, so the delta is the honest end-to-end
    perturbation.  This is the per-experiment justification for choosing
    bf16 on the long NN-posterior protocols (~2x MXU throughput).
    """
    from fnmatch import fnmatch

    from pmpx.experiments.mnist import pretrain

    out = {}
    # `only` arrives as a comma string from Python callers but as a
    # tuple from the CLI (whose value parser splits on commas)
    if isinstance(only, str):
        only = tuple(p for p in only.split(",") if p)
    pats = list(only or ())

    def measure(name, make_target, spec):
        if pats and not any(fnmatch(name, p) for p in pats):
            return
        try:
            t32 = make_target(None)
            t16 = make_target(jnp.bfloat16)
            theta = pretrain(t32, 10)
            keys = jax.random.split(jax.random.key(42), iters)

            def ensemble(target, sup):
                @jax.jit
                def f(ks, th, X):
                    with target.bound_data(X):
                        def one(k):
                            th2, o = sup(k, th)
                            la = jnp.ravel(
                                jnp.asarray(o["log_accept"], jnp.float32)
                            )
                            return la, jnp.any(th2 != th)

                        return jax.lax.map(one, ks)

                return f(keys, theta, target.X)

            la32, mv32 = ensemble(t32, spec.build(t32))
            la16, mv16 = ensemble(t16, spec.build(t16))
            la32, la16 = np.asarray(la32), np.asarray(la16)
            cell = {
                "move_rate_f32": float(np.mean(np.asarray(mv32))),
                "move_rate_bf16": float(np.mean(np.asarray(mv16))),
                "mean_abs_dlogA": float(np.mean(np.abs(la32 - la16))),
            }
            cell["move_rate_delta"] = round(
                cell["move_rate_bf16"] - cell["move_rate_f32"], 4
            )
            out[name] = cell
        except Exception as e:  # record the failure, keep measuring
            out[name] = {"error": str(e)[:200]}
        if on_cell is not None:
            on_cell(name, out[name])

    x, y, _, _ = load_mnist(n_train=n_mnist, n_test=8,
                            class_sep=class_sep)
    for algo in ("mh", "mp", "pmp"):
        measure(
            f"mnist_CNN_{algo}",
            lambda dt: NNPosterior(
                MNIST_MODELS["CNN"]("nhwc"), x, y, temper=10.0,
                init_key=jax.random.key(0), proposal_chunk=2,
                compute_dtype=dt,
            ),
            _mnist_spec(algo, 1e-4, N),
        )
    xc, yc, _, _ = load_cifar10(n_train=n_cifar, n_test=8,
                                class_sep=class_sep)
    for algo in ("sp_hmc", "mp_hmc", "pmp_hmc"):
        measure(
            f"cifar_{algo}",
            lambda dt: _lenet_target(
                "nhwc", xc, yc, proposal_chunk=1, compute_dtype=dt
            ),
            _cifar_spec(algo, N, 0.1, 0.0005),
        )
    return out


def bf16_chain(
    algo: str = "mh",
    num_steps: int = 10000,
    chunk: int = 500,
    N: int = 7,
    alpha: float = 1e-4,
    n_train: int = 60000,
    n_test: int = 10000,
    class_sep: float = 0.35,
    label_noise: float = 0.05,
    seed: int = 0,
    pretrain_steps: int = 50,
    proposal_chunk: int = 4,
    out_dir: str = "artifacts/bf16_fidelity",
):
    """Chain-level bf16 fidelity at the paper protocol (VERDICT r4 #4).

    ``bf16_delta`` bounds the ONE-step acceptance perturbation; this
    study bounds what the production bf16 rows actually claim — that the
    chain statistics match f32.  Two MNIST-CNN chains run the exact
    paper-cell protocol (full batch, ``class_sep=0.35`` + 5% label
    noise, per-algo tempering as in ``experiments/mnist.py``) from the
    SAME pretrained state with the SAME key stream; only
    ``compute_dtype`` differs.  Reported per dtype: move rate, tail
    loss mean/std, tail-loss ESS, final train/test accuracy — plus the
    coupled ``first_divergence_step`` (the chains are bit-coupled until
    a bf16-perturbed density first flips a selection).  The reference's
    analogous sensitivity concern is its hand-tuned stabilizer tables
    (``conv_mp.cu:88-97``).
    """
    from pmpx.experiments.mnist import pretrain
    from pmpx.metrics import ess as _ess

    assert num_steps % chunk == 0, "num_steps must be divisible by chunk"
    x_tr, y_tr, x_te, y_te = load_mnist(
        n_train=n_train, n_test=n_test, class_sep=class_sep,
        label_noise=label_noise,
    )
    temper = 1000.0 if algo == "mh" else 10.0
    spec = _mnist_spec(algo, alpha, N)

    def make_target(dt):
        return NNPosterior(
            MNIST_MODELS["CNN"]("nhwc"), x_tr, y_tr, temper=temper,
            init_key=jax.random.key(seed), proposal_chunk=proposal_chunk,
            compute_dtype=dt,
        )

    # shared warm start (pretrained on the f32 target: both chains must
    # begin from the bitwise-identical theta)
    theta0 = pretrain(make_target(None), pretrain_steps)
    keys = jax.random.split(jax.random.key(seed + 1), num_steps // chunk)

    res = {
        "protocol": {
            "cell": f"MNIST_CNN_{algo.upper()}", "num_steps": num_steps,
            "alpha": alpha, "N": N, "temper": temper,
            "n_train": n_train, "class_sep": class_sep,
            "label_noise": label_noise, "seed": seed,
        },
    }
    traces = {}
    for dname, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        target = make_target(dt)
        superstep = spec.build(target)

        def collect(th, o, temper=target.temper):
            moved = o["accepted"] if "accepted" in o else (
                o["root_index"] != 0
            )
            return (-jnp.asarray(o["root_logp"], jnp.float32) / temper,
                    jnp.asarray(moved, jnp.float32).reshape(()))

        @jax.jit
        def chunk_fn(k, t, X):
            with target.bound_data(X):
                return run_chain(superstep, k, t, chunk, collect=collect)

        os.makedirs(out_dir, exist_ok=True)
        theta, loss_parts, mv_parts = theta0, [], []
        for ci, k in enumerate(keys):
            theta, (lo, mv) = chunk_fn(k, theta, x_tr)
            loss_parts.append(np.asarray(lo))
            mv_parts.append(np.asarray(mv))
            # per-chunk heartbeat: the queue's stall monitor watches
            # out-dir mtimes, and this stage otherwise writes nothing
            # until the very end (compiles + 10k steps > 35 min silence)
            with open(os.path.join(
                    out_dir, f"progress_{algo}.log"), "a") as pf:
                pf.write(f"{dname} chunk {ci + 1}/{len(keys)} "
                         f"loss={loss_parts[-1][-1]:.4f}\n")
        loss = np.concatenate(loss_parts).ravel()
        moved = np.concatenate(mv_parts).ravel()
        tail = loss[num_steps // 2:]
        traces[dname] = loss
        res[dname] = {
            "move_rate": float(moved.mean()),
            "loss_mean_tail": float(tail.mean()),
            "loss_std_tail": float(tail.std()),
            "ess_loss_tail": float(_ess(jnp.asarray(tail))),
            "train_acc": float(jax.jit(target.accuracy)(theta, x_tr, y_tr)),
            "test_acc": float(jax.jit(target.accuracy)(theta, x_te, y_te)),
        }
    # coupled-prefix length: same keys => bit-coupled until a perturbed
    # density flips a selection (loss equality is the cheap witness)
    diff = np.nonzero(
        np.abs(traces["f32"] - traces["bf16"])
        > 1e-6 * (1.0 + np.abs(traces["f32"]))
    )[0]
    res["first_divergence_step"] = int(diff[0]) if len(diff) else None
    res["gaps"] = {
        k: res["bf16"][k] - res["f32"][k]
        for k in ("move_rate", "loss_mean_tail", "train_acc", "test_acc")
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, f"bf16_chain_{algo}.json"), "w") as f:
        json.dump(res, f, indent=1)
    np.savez(
        os.path.join(out_dir, f"bf16_chain_{algo}.npz"),
        loss_f32=traces["f32"], loss_bf16=traces["bf16"],
    )
    return res


def run(
    mode: str = "both",  # footprint | table | both | bf16_delta | bf16_chain
    iters: int = 20,
    N: int = 7,
    P: int = 8,
    n_mnist: int = 60000,
    n_cifar: int = 50000,
    proposal_chunk=None,
    only: str | None = None,
    out_dir: str = "results/nn_perf",
    algo: str = "mh",
    num_steps: int = 10000,
    chunk: int = 500,
    class_sep: float = 0.35,
    label_noise: float = 0.05,
    n_test: int = 10000,
):
    if mode == "bf16_chain":
        return bf16_chain(
            algo=algo, num_steps=num_steps, chunk=chunk, N=N,
            n_train=n_mnist, n_test=n_test, class_sep=class_sep,
            label_noise=label_noise, out_dir=out_dir,
        )
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "nn_perf.json")
    # merge into an existing artifact so cell-by-cell reruns accumulate —
    # prior cells are kept, but this run's header (backend, N) wins
    out = {}
    if os.path.exists(path):
        try:
            with open(path) as fh:
                out.update(json.load(fh))
        except Exception:
            pass
    out["backend"] = jax.default_backend()
    out["N"] = N
    out.setdefault("us_per_superstep", {})

    def _dump():  # incremental: a late phase failing keeps earlier data
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)

    def _on_cell(name, value):
        out["us_per_superstep"][name] = value
        _dump()

    if mode in ("footprint", "both"):
        out["footprint"] = footprint(P=P, n_train=n_cifar)
        _dump()
    if mode in ("table", "both"):
        table(
            iters=iters, N=N, n_mnist=n_mnist, n_cifar=n_cifar,
            proposal_chunk=proposal_chunk, only=only,
            on_cell=_on_cell,
        )
        _dump()
    if mode == "bf16_delta":
        out.setdefault("bf16_delta", {})

        def _on_delta(name, value):
            out["bf16_delta"][name] = value
            _dump()

        bf16_delta(
            iters=iters, N=N, n_mnist=n_mnist, n_cifar=n_cifar,
            only=only, on_cell=_on_delta,
        )
        _dump()
    return out
