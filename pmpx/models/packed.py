"""Packed-layout executors for the conv models (drop-in LeNet/MnistCNN).

Same parameters, same math, different physical layout: these shims
delegate ``init`` to the standard flax module (so parameter pytrees,
theta vectors, checkpoints, and the torch interop in ``pmpx.interop``
are bit-compatible with ``LeNet``/``MnistCNN``) but execute the forward
pass in the channel-packed ``(B, C, H*Wr)`` layout of
``pmpx.kernels.convpack`` (channels on sublanes, flattened space on
lanes; convs = shifted contiguous slices + matmuls).

**Measured outcome (v5e, artifacts/nn_perf): the hand-packed layout
LOSES to plain NHWC.** The hypothesis behind it — that NHWC pads small
channel counts to 128 lanes and so inflates activations 6-21x — does
not survive compilation: XLA:TPU lays out and fuses the NHWC conv stack
well enough that the compiled NHWC grad program is ~2x *smaller* and
4-10x *faster* than the packed one (e.g. full-batch CIFAR LeNet grad,
P=8: 25.7 GiB NHWC vs 53.1 GiB packed; MNIST-CNN MH superstep 30.5 ms
NHWC vs 332 ms packed).  The slice-per-tap formulation defeats XLA's
conv fusions and re-materializes shifted copies of the input that the
native conv never instantiates.  The executors stay (a) as the measured
negative result, (b) as the only all-matmul conv path should a future
Mosaic kernel want the layout; the real memory levers for the proposal
axis are ``LeNet(remat=True)`` and ``compute_dtype=bfloat16``
(``pmpx.targets.nn``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pmpx.kernels import convpack as cp
from pmpx.models.cnn import MnistCNN
from pmpx.models.lenet import LeNet

__all__ = ["PackedLeNet", "PackedMnistCNN"]


def _dense(params, x):
    # HIGHEST precision: these logits feed acceptance-weight densities
    # (CLAUDE.md: default matmul precision perturbs weights ~0.5%)
    return (
        jnp.dot(x, params["kernel"],
                precision=jax.lax.Precision.HIGHEST)
        + params["bias"]
    )


def lenet_packed_apply(params, x, remat: bool = True, bn_axis=None):
    """LeNet forward (``models/lenet.py``) in packed layout.

    x: (B, 32, 32, 3) NHWC -> logits (B, 10).  ``bn_axis``: mesh axis
    for sync-BN statistics under data sharding.
    """
    y, g = cp.pack_images(x)
    y, g = cp.conv2d(
        y, params["Conv_0"]["kernel"], params["Conv_0"]["bias"], g,
        remat=remat,
    )
    y = cp.batchnorm(
        y, params["BatchNorm_0"]["scale"], params["BatchNorm_0"]["bias"],
        g, axis_name=bn_axis,
    )
    y = jnp.maximum(y, 0)
    y, g = cp.max_pool2(y, g)
    y, g = cp.conv2d(
        y, params["Conv_1"]["kernel"], params["Conv_1"]["bias"], g,
        remat=remat,
    )
    y = cp.batchnorm(
        y, params["BatchNorm_1"]["scale"], params["BatchNorm_1"]["bias"],
        g, axis_name=bn_axis,
    )
    y = jnp.maximum(y, 0)
    y, g = cp.max_pool2(y, g)
    h = cp.unpack(y, g).reshape(x.shape[0], -1)  # NHWC flatten order
    h = jnp.maximum(_dense(params["Dense_0"], h), 0)
    h = jnp.maximum(_dense(params["Dense_1"], h), 0)
    return _dense(params["Dense_2"], h)


def cnn_packed_apply(params, x, remat: bool = True, bn_axis=None):
    """MnistCNN forward (``models/cnn.py``) in packed layout.

    x: (B, 28, 28[, 1]) -> logits (B, 10).  (``bn_axis`` accepted for
    shim uniformity; MnistCNN has no BatchNorm.)
    """
    y, g = cp.pack_images(x)
    y, g = cp.conv2d(
        y, params["Conv_0"]["kernel"], params["Conv_0"]["bias"], g,
        remat=remat,
    )
    y = jnp.maximum(y, 0)
    y, g = cp.max_pool2(y, g)
    y, g = cp.conv2d(
        y, params["Conv_1"]["kernel"], params["Conv_1"]["bias"], g,
        remat=remat,
    )
    y = jnp.maximum(y, 0)
    h = cp.unpack(y, g).reshape(x.shape[0], -1)  # (B, 2000) NHWC order
    h = jnp.maximum(_dense(params["Dense_0"], h), 0)
    return _dense(params["Dense_1"], h)


class _PackedShim:
    """Quacks like a flax module for ``NNPosterior``: ``init`` delegates to
    the reference flax model (identical params + aux collections), ``apply``
    runs the packed executor."""

    _flax_cls = None
    _apply_fn = None

    def __init__(self, remat: bool = True, bn_axis=None):
        self._flax = self._flax_cls()
        self.remat = remat
        self.bn_axis = bn_axis

    def with_bn_axis(self, axis):
        """Sync-BN variant for data-parallel shards (same params)."""
        return type(self)(remat=self.remat, bn_axis=axis)

    def init(self, rngs, x):
        return self._flax.init(rngs, x)

    def apply(self, variables, x, mutable=None, **kwargs):
        out = type(self)._apply_fn(
            variables["params"], x, remat=self.remat,
            bn_axis=self.bn_axis,
        )
        if mutable:
            # BatchNorm runs in batch-statistics mode; running averages
            # are posterior-irrelevant (see models/lenet.py) — return the
            # aux collections unchanged.
            return out, {
                k: v for k, v in variables.items() if k != "params"
            }
        return out


class PackedLeNet(_PackedShim):
    _flax_cls = LeNet
    _apply_fn = staticmethod(lenet_packed_apply)


class PackedMnistCNN(_PackedShim):
    _flax_cls = MnistCNN
    _apply_fn = staticmethod(cnn_packed_apply)
