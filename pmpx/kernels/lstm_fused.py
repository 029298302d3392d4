"""Fused LSTM-posterior forward: all P speculative networks in one kernel.

The MNIST LSTM posterior (reference ``complex_nets/Mnist/LSTM/PMP_LSTM.py``,
28-step row sequence, 64 hidden units, full-batch 60k) is HBM-bound on the
XLA path: every scan step materializes the (P*B, 4H) gate preactivations to
HBM, so a P=8 superstep moves ~16 GB and costs ~156 ms — ~10x the roofline
(``artifacts/nn_perf/nn_perf.json``: bf16 only buys 1.23x, the signature of
a bandwidth-bound loop).

This kernel keeps the recurrence on-chip.  Grid = (batch tiles, P) with P
innermost, so each X tile is DMA'd from HBM ONCE and reused by all P
speculative parameter sets (Pallas skips the copy while the block index is
unchanged).  The 28-step loop is unrolled inside the kernel: h and c never
leave VMEM/registers, gate preactivations are consumed in place, and the
only HBM writes are the final hidden states (P, B, H).  Per superstep the
traffic drops from ~16 GB to ~0.3 GB (X once + weights + h_final).

X is passed TIME-MAJOR ``(T, B, F)`` so the kernel picks time step t by
indexing the leading (untiled) axis — no lane-dimension slicing, which
Mosaic handles poorly (CLAUDE.md lane-op rules).  The two per-step matmuls
(x_t @ Wx and h @ Wh) accumulate in f32 via ``preferred_element_type``.

Weight layout matches ``flax.linen.OptimizedLSTMCell`` exactly: gate
columns concatenated [i | f | g | o], ``c' = sig(f)*c + sig(i)*tanh(g)``,
``h' = sig(o)*tanh(c')`` (flax ``OptimizedLSTMCell.__call__``; the input
kernels ``i{i,f,g,o}`` carry no bias, the hidden kernels ``h{i,f,g,o}``
do).  ``attach()`` wires the kernel into an ``NNPosterior`` built over
``pmpx.models.MnistLSTM`` as its ``log_prob_batch`` fast path — the
random-walk MTM samplers the reference uses for MNIST never need
gradients, so the forward-only kernel covers the whole protocol.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["lstm_final_hidden", "make_fast_log_prob_batch", "attach"]

_GATES = "ifgo"


def _kernel(x_ref, wx_ref, wh_ref, b_ref, out_ref, *, T: int, H: int):
    """One (batch tile, proposal) cell: run the full T-step recurrence.

    x_ref: (T, TB, F) time-major input tile (all steps resident in VMEM)
    wx_ref: (1, F, 4H); wh_ref: (1, H, 4H); b_ref: (1, 1, 4H)
    out_ref: (1, TB, H) final hidden state
    """
    tb = x_ref.shape[1]
    dt = x_ref.dtype
    wx = wx_ref[0]          # (F, 4H)
    wh = wh_ref[0]          # (H, 4H)
    b = b_ref[0]            # (1, 4H) — keep 2-D (Mosaic: no 1-D vectors)
    h = jnp.zeros((tb, H), jnp.float32)
    c = jnp.zeros((tb, H), jnp.float32)
    for t in range(T):      # unrolled: h, c never touch HBM
        xt = x_ref[t]       # (TB, F) — leading-axis index, no lane slicing
        z = (
            jax.lax.dot(xt, wx, preferred_element_type=jnp.float32)
            + jax.lax.dot(
                h.astype(dt), wh, preferred_element_type=jnp.float32
            )
            + b.astype(jnp.float32)
        )
        i = jax.nn.sigmoid(z[:, 0 * H:1 * H])
        f = jax.nn.sigmoid(z[:, 1 * H:2 * H])
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(z[:, 3 * H:4 * H])
        c = f * c + i * g
        h = o * jnp.tanh(c)
    out_ref[0] = h


@functools.partial(
    jax.jit, static_argnames=("block_b", "interpret")
)
def lstm_final_hidden(x_tm, Wx, Wh, b, *, block_b: int = 256,
                      interpret: bool = False):
    """Final hidden state of a zero-carry LSTM for P parameter sets.

    x_tm: (T, B, F) time-major input (one shared dataset)
    Wx: (P, F, 4H) input kernels, gate columns [i|f|g|o]
    Wh: (P, H, 4H) hidden kernels; b: (P, 4H) hidden biases
    returns: (P, B, H) f32 final hidden states
    """
    T, B, F = x_tm.shape
    P, _, H4 = Wx.shape
    H = H4 // 4
    nb = -(-B // block_b)
    Bp = nb * block_b
    if Bp != B:
        x_tm = jnp.pad(x_tm, ((0, 0), (0, Bp - B), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, T=T, H=H),
        grid=(nb, P),  # P innermost: the X tile is DMA'd once per tile
        in_specs=[
            pl.BlockSpec((T, block_b, F), lambda bi, p: (0, bi, 0)),
            pl.BlockSpec((1, F, H4), lambda bi, p: (p, 0, 0)),
            pl.BlockSpec((1, H, H4), lambda bi, p: (p, 0, 0)),
            # (P, 1, 4H): Mosaic requires the block's last two dims to be
            # (8k, 128k) or equal to the array's — (1, 4H) over (P, 4H)
            # is neither, so carry the bias with an explicit unit axis
            pl.BlockSpec((1, 1, H4), lambda bi, p: (p, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_b, H), lambda bi, p: (p, bi, 0)),
        out_shape=jax.ShapeDtypeStruct((P, Bp, H), jnp.float32),
        interpret=interpret,
    )(x_tm, Wx, Wh, b[:, None, :])
    return out[:, :B, :]


def _gate_stack(cell_params, prefix):
    """Concatenate per-gate kernels into flax's [i|f|g|o] column layout."""
    return jnp.concatenate(
        [cell_params[f"{prefix}{g}"]["kernel"] for g in _GATES], axis=-1
    )


def make_fast_log_prob_batch(posterior, *, block_b: int = 256,
                             interpret=None):
    """Build a kernel-backed ``log_prob_batch(Theta)`` for an NNPosterior
    over ``MnistLSTM`` (28x28 row sequence -> Dense head, CE loss).

    Reads ``posterior.X`` at trace time so ``bound_data`` still threads
    the dataset through as a jit argument, and honors
    ``posterior.compute_dtype`` the same way ``NNPosterior._logits``
    does (params and activations cast; loss reduction in f32).
    """
    unravel = posterior._unravel
    if interpret is None:
        # Mosaic compiles only for TPU; elsewhere (the CPU test mesh)
        # fall back to interpret mode, same convention as fused_chain
        interpret = jax.default_backend() != "tpu"

    def fast(Theta, key=None):
        params = jax.vmap(unravel)(Theta)
        cell = params["OptimizedLSTMCell_0"]
        head = params["Dense_0"]
        dt = posterior.compute_dtype
        Wx = _gate_stack(cell, "i")                       # (P, 28, 256)
        Wh = _gate_stack(cell, "h")                       # (P, 64, 256)
        b = jnp.concatenate(
            [cell[f"h{g}"]["bias"] for g in _GATES], axis=-1
        )                                                 # (P, 256)
        X = posterior.X
        x_tm = X.reshape(X.shape[0], 28, 28).transpose(1, 0, 2)
        if dt is not None:
            x_tm, Wx, Wh = (a.astype(dt) for a in (x_tm, Wx, Wh))
        hfin = lstm_final_hidden(
            x_tm, Wx, Wh, b.astype(jnp.float32),
            block_b=block_b, interpret=interpret,
        )                                                 # (P, B, 64) f32
        kern, bias = head["kernel"], head["bias"]
        logits = (
            jnp.einsum(
                "pbh,pho->pbo", hfin, kern.astype(jnp.float32)
            )
            + bias.astype(jnp.float32)[:, None, :]
        )
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits, posterior.Y[None, :]
        ).mean(axis=-1)                                   # (P,)
        return -posterior.temper * ce

    return fast


def attach(posterior, *, block_b: int = 256,
           interpret=None) -> None:
    """Install the fused-kernel density on an MnistLSTM NNPosterior.

    After this, ``log_prob_batch`` and ``log_prob`` evaluate through the
    Pallas kernel (identical math to the flax path; float reassociation
    only).  ``value_and_grad_batch`` keeps the XLA path — the MNIST MTM
    protocols are gradient-free, and HMC targets never use MnistLSTM.
    """
    cell = None
    try:
        tree = posterior._unravel(posterior._theta0)
        cell = tree["OptimizedLSTMCell_0"]
        for g in _GATES:
            _ = cell[f"i{g}"]["kernel"], cell[f"h{g}"]["bias"]
        _ = tree["Dense_0"]["kernel"]
    except (KeyError, TypeError) as e:
        raise ValueError(
            "attach() requires an NNPosterior over pmpx.models.MnistLSTM "
            f"(OptimizedLSTMCell_0 + Dense_0 param tree); got {e!r}"
        ) from None
    if posterior.stochastic:
        raise ValueError("fused LSTM kernel is deterministic-only")
    fast = make_fast_log_prob_batch(
        posterior, block_b=block_b, interpret=interpret
    )
    posterior._fast_batch = fast
