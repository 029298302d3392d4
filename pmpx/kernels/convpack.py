"""Channel-packed conv layout for small-channel convs.

**Measured negative result — see ``pmpx/models/packed.py``.**  The
motivating hypothesis was that TPU tiling (8 sublanes, 128 lanes) makes
NHWC activations with C in {6, 10, 16, 20} pad to 128 lanes, a 6.4x-21x
memory inflation multiplied by the proposal axis P (reference workload:
``complex_nets/Cifar-10/cifar_PMPhmc.py:126-163``).  Compiled
measurement (v5e, artifacts/nn_perf) disproved it: XLA:TPU's native
conv layouts cost ~half the memory of this formulation and run 4-10x
faster.  Kept as the all-matmul, gather-free conv formulation and its
oracle tests.

Activations live as ``(B, C, H*Wr)``: channels on *sublanes* (pad to
8, worst case 2.7x for C=3) and the flattened spatial grid on *lanes*
(pad to 128, ~1.1x for real grids).  Convolutions become KH*KW shifted
*contiguous* slices of the flat spatial axis, each contracted against a
(C, O) kernel slab on the MXU — no gathers, no im2col materialization,
no dynamic shapes.

The one subtlety is the "wide rows" trick: a VALID conv shrinks row width
W -> W-KW+1, which would break the contiguous-slice identity
``in_flat[q + dy*Wr + dx]`` (it needs input and output rows to share the
same physical width ``Wr``).  So rows keep their physical width and the
last ``Wr - W`` columns of each row hold junk values (finite garbage
computed across row boundaries).  Junk never contaminates valid outputs —
a valid output column x < W reads input columns x+dx <= W-1+KW-1 =
W_in-1, all valid — and pooling with even widths keeps junk columns
aligned to junk columns.  Statistics (BatchNorm) mask junk explicitly.

Everything is plain jnp slices/matmuls, so ``jax.vmap`` (proposal axis)
and autodiff compose; ``conv2d`` is wrapped in ``jax.checkpoint`` so the
backward pass recomputes the KH*KW slices instead of saving each one.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = [
    "Grid",
    "pack_images",
    "unpack",
    "conv2d",
    "batchnorm",
    "max_pool2",
]


@dataclass(frozen=True)
class Grid:
    """Static shape metadata for a wide-row packed activation.

    h: number of rows; wr: physical row width (lanes per row);
    w: valid columns per row (w <= wr; columns [w, wr) are junk).
    """

    h: int
    wr: int
    w: int

    @property
    def size(self) -> int:
        return self.h * self.wr


def pack_images(x: jnp.ndarray) -> tuple[jnp.ndarray, Grid]:
    """(B, H, W[, C]) NHWC image batch -> ((B, C, H*W), Grid)."""
    if x.ndim == 3:
        x = x[..., None]
    B, H, W, C = x.shape
    packed = x.transpose(0, 3, 1, 2).reshape(B, C, H * W)
    return packed, Grid(H, W, W)


def unpack(x: jnp.ndarray, g: Grid) -> jnp.ndarray:
    """(B, C, H*Wr) packed -> (B, H, W, C) NHWC with junk columns dropped."""
    B, C, _ = x.shape
    return x.reshape(B, C, g.h, g.wr)[..., : g.w].transpose(0, 2, 3, 1)


def valid_mask(g: Grid, dtype=jnp.float32) -> jnp.ndarray:
    """(H*Wr,) 1.0 on valid columns, 0.0 on junk."""
    cols = jnp.arange(g.wr) < g.w
    return jnp.broadcast_to(cols, (g.h, g.wr)).reshape(-1).astype(dtype)


def _conv2d_body(x, kernel, bias, g: Grid):
    KH, KW, C, O = kernel.shape
    oh, ow = g.h - KH + 1, g.w - KW + 1
    out_len = oh * g.wr
    # the largest slice ends at (KH-1)*wr + (KW-1) + out_len = h*wr + KW-1
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, KW - 1)))
    out = jnp.broadcast_to(
        bias[None, :, None], (x.shape[0], O, out_len)
    ).astype(x.dtype)
    for dy in range(KH):
        for dx in range(KW):
            off = dy * g.wr + dx
            xs = jax.lax.slice_in_dim(xp, off, off + out_len, axis=2)
            # (C,O) x (B,C,L) -> (B,O,L): cross-correlation, same as
            # flax nn.Conv (HWIO kernel, no flip)
            out = out + jnp.einsum(
                "co,bcl->bol", kernel[dy, dx], xs,
                precision=jax.lax.Precision.HIGHEST,
            )
            # pin the accumulation order: left alone, XLA tree-reduces
            # the KH*KW-term sum and keeps O(KH*KW) copies of the
            # full-size partial alive at once (observed 24x1.33 GiB on
            # full-batch CIFAR); the barrier serializes so the buffer
            # is reused in place
            out = jax.lax.optimization_barrier(out)
    return out


# Rematerialize: the autodiff of the slice+matmul chain would otherwise
# save all KH*KW shifted slices of x as residuals (a KH*KW-fold copy of
# the input); under remat the backward recomputes them from x.
_conv2d_remat = jax.checkpoint(_conv2d_body, static_argnums=(3,))


def conv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: jnp.ndarray,
    g: Grid,
    remat: bool = True,
) -> tuple[jnp.ndarray, Grid]:
    """VALID cross-correlation in packed layout.

    x: (B, C, h*wr); kernel: (KH, KW, C, O) (flax HWIO); bias: (O,).
    Returns ((B, O, oh*wr), Grid(oh, wr, ow)).
    """
    KH, KW, _, _ = kernel.shape
    body = _conv2d_remat if remat else _conv2d_body
    out = body(x, kernel, bias, g)
    return out, Grid(g.h - KH + 1, g.wr, g.w - KW + 1)


def batchnorm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    g: Grid,
    eps: float = 1e-5,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Batch-statistics BatchNorm over (B, valid positions) per channel.

    Matches flax ``nn.BatchNorm(use_running_average=False)`` on the valid
    columns (biased variance, eps inside the rsqrt); junk columns are
    excluded from the statistics but still normalized (stay finite).

    ``axis_name``: sync-BN over a mesh axis (data-parallel full-batch
    posteriors need *global* batch statistics or the sharded density is
    a different function than the unsharded one).
    """
    m = valid_mask(g, x.dtype)
    count = x.shape[0] * g.h * g.w
    s = jnp.sum(x * m, axis=(0, 2))  # (C,)
    if axis_name is not None:
        s = jax.lax.psum(s, axis_name)
        count = count * jax.lax.psum(1, axis_name)
    mean = s / count
    centered = x - mean[:, None]
    v = jnp.sum((centered * m) ** 2, axis=(0, 2))
    if axis_name is not None:
        v = jax.lax.psum(v, axis_name)
    var = v / count
    inv = jax.lax.rsqrt(var + eps)
    return centered * (scale * inv)[:, None] + bias[:, None]


def max_pool2(x: jnp.ndarray, g: Grid) -> tuple[jnp.ndarray, Grid]:
    """2x2 stride-2 max pool. Requires even h, wr, w so valid columns pool
    with valid columns and junk with junk."""
    if g.h % 2 or g.wr % 2 or g.w % 2:
        raise ValueError(f"max_pool2 needs even grid, got {g}")
    B, C, _ = x.shape
    x4 = x.reshape(B, C, g.h // 2, 2, g.wr // 2, 2)
    out = x4.max(axis=(3, 5)).reshape(B, C, -1)
    return out, Grid(g.h // 2, g.wr // 2, g.w // 2)
