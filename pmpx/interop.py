"""Interop with the reference's artifacts: torch checkpoint import.

The reference warm-starts its NN samplers from SGD-pretrained torch
``state_dict`` pickles (``FC_model.pkl`` loaded at ``PMP_FC.py:188-189``,
``cifar.pkl`` at ``cifar_PMPhmc.py:175-176``).  ``theta_from_torch_state``
maps such a state dict onto a pmpx model's flattened parameter vector so
existing reference checkpoints can seed pmpx chains directly.

torch is an optional dependency: everything degrades with a clear error if
it is absent.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["theta_from_torch_state", "load_torch_pickle"]


def load_torch_pickle(path: str) -> Dict[str, np.ndarray]:
    """Load a torch .pkl/.pth state dict to numpy arrays (CPU)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().numpy() for k, v in sd.items()}


def _convert_linear(w: np.ndarray, b: np.ndarray):
    # torch Linear stores (out, in); flax Dense kernel is (in, out)
    return {"kernel": jnp.asarray(w.T), "bias": jnp.asarray(b)}


def _convert_conv(w: np.ndarray, b: np.ndarray):
    # torch Conv2d (out, in, kh, kw) -> flax Conv (kh, kw, in, out)
    return {
        "kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0))),
        "bias": jnp.asarray(b),
    }


def _nchw_to_nhwc_rows(w_t: np.ndarray, channels: int) -> np.ndarray:
    """Permute the input rows of a (in, out) dense kernel whose input is a
    flattened conv feature map: torch flattens NCHW (row index c*H*W+h*W+w)
    while flax flattens NHWC (row index h*W*C+w*C+c).  Assumes a square
    spatial grid, true for every reference model (CNN 20x10x10 ->
    ``PMP_CNN.py:29``; LeNet 16x5x5 -> ``cifar_PMPhmc.py:47``)."""
    d_in = w_t.shape[0]
    hw, rem = divmod(d_in, channels)
    side = int(round(hw ** 0.5))
    if rem or side * side != hw:
        raise ValueError(
            f"cannot infer square conv grid from d_in={d_in}, C={channels}"
        )
    # rows as (C, H, W) -> transpose to (H, W, C) -> flatten
    return w_t.reshape(channels, side, side, -1).transpose(1, 2, 0, 3
                                                           ).reshape(d_in, -1)


def _convert_lstm(
    w_ih: np.ndarray, w_hh: np.ndarray, b_ih: np.ndarray, b_hh: np.ndarray
):
    """torch nn.LSTM l0 tensors -> flax OptimizedLSTMCell param dict.

    Both stacks gates in (i, f, g, o) order; torch keeps one (4H, in)
    matrix per side where flax keeps a Dense per gate per side.  flax puts
    the single bias on the h-side Dense, so it receives b_ih + b_hh (the
    two biases are only ever used summed)."""
    hidden = w_hh.shape[1]
    out = {}
    for g, name in enumerate("ifgo"):
        sl = slice(g * hidden, (g + 1) * hidden)
        out[f"i{name}"] = {"kernel": jnp.asarray(w_ih[sl].T)}
        out[f"h{name}"] = {
            "kernel": jnp.asarray(w_hh[sl].T),
            "bias": jnp.asarray(b_ih[sl] + b_hh[sl]),
        }
    return out


def theta_from_torch_state(
    posterior, state: Dict[str, np.ndarray]
) -> jnp.ndarray:
    """Map a torch state dict onto an NNPosterior's theta vector.

    Works for sequentially-ordered torch modules whose layer order matches
    the flax model's parameter order (the reference models are all plain
    sequences).  Layers are matched positionally by kind: 4-D weights pair
    with flax ``Conv`` kernels, 2-D with ``Dense``, 1-D weight/bias pairs
    with ``BatchNorm`` scale/bias, and torch ``nn.LSTM`` quadruples
    (``weight_ih_l0``/``weight_hh_l0``/biases) with ``OptimizedLSTMCell``
    gate Denses.  The first Dense after a Conv gets its input rows
    permuted from torch's NCHW flatten order to flax's NHWC.

    Covers all four committed reference warm-start checkpoints:
    ``FC_model.pkl`` (``PMP_FC.py:188``), ``CNN_model.pkl``,
    ``LSTM_model.pkl``, ``cifar.pkl`` (``cifar_PMPhmc.py:175``).
    BatchNorm running statistics are ignored: the posterior always runs BN
    in batch-statistics (train) mode, exactly like the reference's
    always-``train()`` modules.
    """
    import re

    def natural(name: str):
        # flax auto-names are e.g. Dense_0, Dense_10: sort the numeric
        # suffix numerically (lexicographic order would put 10 before 2)
        m = re.match(r"(.*?)_(\d+)$", name)
        return (m.group(1), int(m.group(2))) if m else (name, -1)

    params = posterior._unravel(posterior.init_theta())
    flat_names = sorted(params.keys(), key=natural)

    # collect torch layers in insertion order, classified by kind
    converted = []  # list of (kind, flax-param-dict)
    seen_lstm = set()
    for k in state.keys():
        m = re.match(r"(.*?)\.?weight_ih_l0$", k)
        if m:
            base = m.group(1)
            if base in seen_lstm:
                continue
            seen_lstm.add(base)
            pre = base + "." if base else ""
            converted.append((
                "lstm",
                _convert_lstm(
                    state[f"{pre}weight_ih_l0"], state[f"{pre}weight_hh_l0"],
                    state[f"{pre}bias_ih_l0"], state[f"{pre}bias_hh_l0"],
                ),
            ))
            continue
        if not k.endswith("weight") or k[: -len("weight")] + "bias" not in state:
            continue
        w, b = state[k], state[k[: -len("weight")] + "bias"]
        if w.ndim == 4:
            converted.append(("conv", _convert_conv(w, b)))
        elif w.ndim == 2:
            converted.append(("dense", _convert_linear(w, b)))
        elif w.ndim == 1:
            converted.append((
                "norm",
                {"scale": jnp.asarray(w), "bias": jnp.asarray(b)},
            ))

    # the first torch Dense after a conv stack consumes an NCHW-flattened
    # feature map: permute its input rows to flax's NHWC flatten order
    last_conv_channels = None
    first_dense_seen = False
    fixed = []
    for kind, conv in converted:
        if kind == "conv":
            last_conv_channels = conv["kernel"].shape[-1]
        elif kind == "dense" and not first_dense_seen:
            first_dense_seen = True
            if last_conv_channels is not None:
                conv = dict(conv)
                conv["kernel"] = jnp.asarray(
                    _nchw_to_nhwc_rows(
                        np.asarray(conv["kernel"]), int(last_conv_channels)
                    )
                )
        fixed.append((kind, conv))

    # flax auto-numbering (Dense_0, Dense_1, ...) follows call order
    # *within* each module kind, but the sorted cross-kind order need not
    # match torch's sequential order (e.g. Dense_0 sorts before
    # OptimizedLSTMCell_0).  Match per-kind queues instead.
    kind_of = {
        "Conv": "conv", "Dense": "dense", "BatchNorm": "norm",
        "OptimizedLSTMCell": "lstm", "LSTMCell": "lstm",
    }
    queues: Dict[str, list] = {}
    for kind, conv in fixed:
        queues.setdefault(kind, []).append(conv)

    new_params = dict(params)
    for name in flat_names:
        stem = natural(name)[0]
        kind = kind_of.get(stem)
        if kind is None:
            continue
        if not queues.get(kind):
            raise ValueError(
                f"model expects a {kind!r} layer for {name} but the torch "
                f"state has none left (torch kinds: {[k for k, _ in fixed]})"
            )
        conv = queues[kind].pop(0)
        want = jax.tree_util.tree_map(jnp.shape, params[name])
        got = jax.tree_util.tree_map(jnp.shape, conv)
        if want != got:
            raise ValueError(
                f"shape mismatch at {name}: model {want} vs torch {got}"
            )
        new_params[name] = conv
    leftovers = {k: len(v) for k, v in queues.items() if v}
    if leftovers:
        raise ValueError(f"unconsumed torch layers: {leftovers}")
    return posterior.theta_from_params(new_params)
