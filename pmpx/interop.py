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


def theta_from_torch_state(
    posterior, state: Dict[str, np.ndarray]
) -> jnp.ndarray:
    """Map a torch MLP/CNN state dict onto an NNPosterior's theta vector.

    Works for sequentially-numbered torch modules whose layer order matches
    the flax model's parameter order (the reference models are all plain
    sequences).  Layers are matched positionally by kind: 4-D tensors pair
    with flax Conv kernels, 2-D with Dense kernels.
    """
    import jax

    import re

    def natural(name: str):
        # flax auto-names are e.g. Dense_0, Dense_10: sort the numeric
        # suffix numerically (lexicographic order would put 10 before 2)
        m = re.match(r"(.*?)_(\d+)$", name)
        return (m.group(1), int(m.group(2))) if m else (name, -1)

    params = posterior._unravel(posterior.init_theta())
    flat_names = sorted(params.keys(), key=natural)

    # collect torch (weight, bias) pairs in insertion order
    pairs = []
    keys = [k for k in state.keys() if k.endswith("weight")]
    for k in keys:
        base = k[: -len("weight")]
        bk = base + "bias"
        if bk in state:
            pairs.append((state[k], state[bk]))
    converted = []
    for w, b in pairs:
        if w.ndim == 4:
            converted.append(_convert_conv(w, b))
        elif w.ndim == 2:
            converted.append(_convert_linear(w, b))
        # (1-D batchnorm / LSTM params are model-specific; extend as needed)

    dense_like = [
        n for n in flat_names if "kernel" in params[n] or (
            isinstance(params[n], dict) and "kernel" in params[n]
        )
    ]
    if len(converted) != len(dense_like):
        raise ValueError(
            f"layer count mismatch: torch has {len(converted)} "
            f"weight/bias pairs, model has {len(dense_like)} kernels"
        )
    new_params = dict(params)
    for name, conv in zip(dense_like, converted):
        want = params[name]["kernel"].shape
        got = conv["kernel"].shape
        if want != got:
            raise ValueError(
                f"shape mismatch at {name}: model {want} vs torch {got}"
            )
        new_params[name] = conv
    return posterior.theta_from_params(new_params)
