"""NN-zoo performance table + packed-layout memory footprints (TPU).

Two measurements the reference never makes but whose workloads it defines:

* ``footprint``: compiled peak-memory analysis of the batched LeNet/CNN
  density (and gradient) programs in NHWC vs packed layout — the number
  that decides whether full-batch image posteriors (``cifar_PMPhmc.py``
  full 50k CIFAR, ``PMP_CNN.py`` full 60k MNIST) fit one chip and at what
  proposal parallelism.
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

from pmpx import tree
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
from pmpx.experiments.mnist import MODELS as MNIST_MODELS


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


def _lenet_target(layout: str, x, y, proposal_chunk=None):
    model = LeNet() if layout == "nhwc" else PackedLeNet()
    return NNPosterior(
        model, x, y, init_key=jax.random.key(0),
        proposal_chunk=proposal_chunk,
    )


def footprint(P: int = 8, n_train: int = 50000, class_sep: float = 1.5):
    """Peak compiled memory of the P-proposal LeNet grad program, by
    layout. The NHWC/packed ratio is the lane-padding tax; NHWC at full
    scale may be rejected outright by the TPU AOT compiler
    (``compile_oom``), which is the point."""
    x, y, _, _ = load_cifar10(n_train=n_train, n_test=8,
                              class_sep=class_sep)
    out = {"P": P, "n_train": n_train, "backend": jax.default_backend()}
    for layout in ("nhwc", "packed"):
        t = _lenet_target(layout, x, y)
        theta = jax.ShapeDtypeStruct((P, t.d), jnp.float32)
        out[f"lenet_grad_{layout}"] = _mem_stats(
            t, "value_and_grad_batch", theta
        )
    # the configuration that actually runs long chains: packed + chunked
    t = _lenet_target("packed", x, y, proposal_chunk=1)
    theta = jax.ShapeDtypeStruct((P, t.d), jnp.float32)
    out["lenet_grad_packed_chunk1"] = _mem_stats(
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


def _mnist_spec(algo: str, alpha: float, N: int) -> SamplerSpec:
    if algo == "mh":
        return SamplerSpec(algo="mh", step_size=alpha)
    if algo == "mp":
        return SamplerSpec(algo="mp", N=N, step_size=alpha,
                           selection="single", stabilizer="zscore")
    return SamplerSpec(algo="pmp", N=1, depth=tree.binary_depth(N + 1),
                       step_size=alpha, selection="single",
                       stabilizer="zscore")


def _cifar_spec(algo: str, N: int, step_size: float,
                mom_scale: float) -> SamplerSpec:
    return SamplerSpec(
        algo=algo,
        N=1 if algo == "pmp_hmc" else N,
        depth=tree.binary_depth(N + 1),
        step_size=step_size, mom_scale=mom_scale,
        rule="mh_clamp" if algo == "pmp_hmc" else "barker",
        accept_scale=1000.0 if algo == "sp_hmc" else 1.0,
    )


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
):
    """us/superstep for each NN-zoo cell at reference batch sizes.

    Conv cells bound concurrent proposals (even packed, 8 full-batch conv
    grads exceed one chip's HBM); ``proposal_chunk`` overrides per-cell
    defaults when set."""
    cells = {}
    x, y, _, _ = load_mnist(n_train=n_mnist, n_test=8,
                            class_sep=class_sep)
    for model in ("FC", "CNN", "LSTM"):
        chunk = proposal_chunk or (
            cnn_chunk if model == "CNN" else None
        )
        target = NNPosterior(
            MNIST_MODELS[model]("packed"), x, y, temper=10.0,
            init_key=jax.random.key(0), proposal_chunk=chunk,
        )
        for algo in ("mh", "mp", "pmp"):
            us = _time_cell(target, _mnist_spec(algo, alpha, N), iters)
            cells[f"mnist_{model}_{algo}"] = round(us, 1)
    xc, yc, _, _ = load_cifar10(n_train=n_cifar, n_test=8,
                                class_sep=class_sep)
    target = _lenet_target("packed", xc, yc,
                           proposal_chunk=proposal_chunk or cifar_chunk)
    for algo in ("sp_hmc", "mp_hmc", "pmp_hmc"):
        us = _time_cell(
            target, _cifar_spec(algo, N, 0.1, 0.0005), iters
        )
        cells[f"cifar_{algo}"] = round(us, 1)
    return cells


def run(
    mode: str = "both",  # footprint | table | both
    iters: int = 20,
    N: int = 7,
    P: int = 8,
    n_mnist: int = 60000,
    n_cifar: int = 50000,
    proposal_chunk=None,
    out_dir: str = "results/nn_perf",
):
    out = {"backend": jax.default_backend(), "N": N}
    if mode in ("footprint", "both"):
        out["footprint"] = footprint(P=P, n_train=n_cifar)
    if mode in ("table", "both"):
        out["us_per_superstep"] = table(
            iters=iters, N=N, n_mnist=n_mnist, n_cifar=n_cifar,
            proposal_chunk=proposal_chunk,
        )
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "nn_perf.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    return out
