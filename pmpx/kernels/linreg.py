"""Pallas TPU kernel: batched residual-sum-of-squares for Bayesian linreg.

TPU-native equivalent of the reference's CUDA likelihood kernels
(``conv_mp.cu:10-36``, ``conv_pmp.cu:10-36``, clones in ``convery_time_*.cu``,
``ess_per_s_*.cu``, ``500_*.cu``, ``100000_*.cu``): one GPU thread per
proposal serially loops over all data points.  Here the same O(P*n) sweep is
expressed as VPU-wide tiles: data lives in VMEM as a (rows, 128) lane-major
grid, a sublane-block of proposals is evaluated against a data block with one
(TP, rows, 128) fused broadcast-multiply-accumulate, and the per-proposal
partial sums accumulate in the output block across the data grid dimension.

The kernel computes only ``rss[p] = sum_i (y_i - b0_p - b1_p x_i)^2``; the
remaining per-proposal terms of the Gaussian log-likelihood
(``-n/2 log(2 pi sigma_p^2) - rss_p / (2 sigma_p^2)``) are O(P) and fuse into
the surrounding jit (see ``pmpx.targets.linreg``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["batched_rss", "batched_rss_xla", "pad_proposals"]


def pad_proposals(b0: jnp.ndarray, b1: jnp.ndarray):
    """Zero-pad proposal vectors to a batch size ``batched_rss`` accepts.

    The kernel chunks proposals by ``tp = min(64, P)`` and needs
    ``P % tp == 0``: any P <= 64 works as-is; above that, a multiple of 64.
    Returns (b0_padded, b1_padded, original_P).
    """
    P = b0.shape[0]
    mult = 64 if P > 64 else 8
    pad = (-P) % mult
    if pad:
        z = jnp.zeros((pad,), b0.dtype)
        b0 = jnp.concatenate([b0, z])
        b1 = jnp.concatenate([b1, z])
    return b0, b1, P

_LANES = 128
# proposals per in-kernel chunk (sublane dimension of the broadcast tile)
_TP = 64
# data rows per grid step; each row is 128 lanes -> 16384 points per block
# (profiled on v5e: (64, 128) tiles run ~1.5x faster than (16, 256))
_ROWS = 128


def _rss_kernel(b0_ref, b1_ref, x_ref, y_ref, out_ref, *, tp):
    """One data-block grid cell; all proposals chunk-looped in-kernel.

    b0_ref, b1_ref : (P, 1) VMEM — all proposal intercepts/slopes (resident)
    x_ref, y_ref   : (ROWS, 128) VMEM — streamed data block
    out_ref        : (P, 1) VMEM — per-proposal RSS accumulator (resident)

    The grid runs over data blocks only, so x/y stream through VMEM exactly
    once per call regardless of P (the first kernel shape — grid over
    (P/TP, rows) — re-read the whole dataset P/TP times: ~67 MB of HBM
    traffic per iteration at P=1024/100k vs ~1 MB here).
    """
    P = out_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    x = x_ref[...][None, :, :]  # (1, ROWS, 128)
    y = y_ref[...][None, :, :]

    def chunk(p, _):
        sl = pl.ds(p * tp, tp)
        b0 = b0_ref[sl, :][:, :, None]  # (tp, 1, 1)
        b1 = b1_ref[sl, :][:, :, None]
        r = y - b0 - b1 * x  # (tp, ROWS, 128)
        # keep intermediates >= 2-D (1-D trips Mosaic layout inference)
        s = jnp.sum(r * r, axis=1)  # (tp, 128)
        out_ref[sl, :] += jnp.sum(s, axis=1, keepdims=True)
        return 0

    jax.lax.fori_loop(0, P // tp, chunk, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def batched_rss(
    b0: jnp.ndarray,
    b1: jnp.ndarray,
    x2d: jnp.ndarray,
    y2d: jnp.ndarray,
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """RSS of P linear models over lane-major data.

    b0, b1 : (P,) proposal parameters; P must be a multiple of 16.
    x2d, y2d : (rows, 128) data, zero-padded at the tail.  NOTE: each padded
        point contributes (0 - b0)^2 = b0^2; callers subtract
        ``pad_count * b0**2`` analytically (see pmpx.targets.linreg).
    Returns (P,) float32.
    """
    P = b0.shape[0]
    rows = x2d.shape[0]
    tp = min(_TP, P)
    if P % tp:
        raise ValueError(f"P={P} must be a multiple of {tp}")
    row_blk = min(_ROWS, rows)
    if rows % row_blk:
        raise ValueError(f"rows={rows} must be a multiple of {row_blk}")

    grid = (rows // row_blk,)
    out = pl.pallas_call(
        functools.partial(_rss_kernel, tp=tp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((P, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((P, 1), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (row_blk, _LANES), lambda r: (r, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (row_blk, _LANES), lambda r: (r, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (P, 1), lambda r: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=5 * P * rows * _LANES,
            bytes_accessed=rows * _LANES * 8 + P * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(b0[:, None], b1[:, None], x2d, y2d)
    return out[:, 0]


@jax.jit
def batched_rss_xla(b0, b1, x2d, y2d):
    """Pure-XLA fallback of :func:`batched_rss` (same padded-data contract).

    Used on non-TPU backends and as the numerical oracle in tests.  Chunked
    over data rows to bound the (P, chunk, 128) intermediate.
    """
    P = b0.shape[0]
    rows = x2d.shape[0]
    chunk = min(_ROWS, rows)

    def body(acc_and_idx, _):
        acc, r0 = acc_and_idx
        xs = jax.lax.dynamic_slice(x2d, (r0, 0), (chunk, _LANES))
        ys = jax.lax.dynamic_slice(y2d, (r0, 0), (chunk, _LANES))
        r = (
            ys[None, :, :]
            - b0[:, None, None]
            - b1[:, None, None] * xs[None, :, :]
        )
        return (acc + jnp.sum(r * r, axis=(1, 2)), r0 + chunk), None

    (acc, _), _ = jax.lax.scan(
        body,
        (jnp.zeros((P,), jnp.float32), 0),
        None,
        length=rows // chunk,
    )
    return acc
