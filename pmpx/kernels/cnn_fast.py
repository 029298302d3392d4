"""MXU-shaped MNIST-CNN forward: all P speculative networks in one pass.

The reference CNN posterior (``complex_nets/Mnist/CNN/PMP_CNN.py:20-42``,
conv(1->10,5x5) -> relu -> maxpool2 -> conv(10->20,3x3) -> relu -> FC(2000
->500) -> FC(10), full-batch 60k) is MXU-starved on the plain NHWC path:
conv1 contracts K=5*5*1=25 against N=10 output channels, so the 128x128
systolic array runs at ~1.5% utilization and conv1 dominates the superstep
(~9.8 ms/proposal measured, ``artifacts/mnist_paper/MP_*50000CNN*.json``).

This path reshapes the SAME arithmetic onto the MXU (float reassociation
only — no approximation):

* **space-to-depth conv1**: the 28x28 input becomes (14,14,4) phase
  channels; the stride-1 5x5 conv becomes a 3x3 conv over 4 input channels
  producing the four 12x12 output *phases* per filter.  K grows 25->36,
  and with all P proposals' filters packed into the output-channel axis
  N grows 10 -> P*4*10 (P=8: 320) — ~20x better MXU tiling for ~1.4x
  redundant MACs (the scattered kernel has 25 live taps of 36).
* **phase-max pooling**: the reference's 2x2/2 maxpool windows are exactly
  the four conv1 output phases at each coarse pixel, so pooling collapses
  to a max over the phase axis — no spatial windowing op at all, and
  ``maxpool(relu(z+b)) == relu(max_ph(z)+b)`` since relu is monotone and
  the bias is phase-constant.
* **proposal-grouped conv2**: all P proposals' (3,3,10,20) filters run as
  ONE feature-grouped conv over the (B,12,12,P*10) pooled stack
  (``feature_group_count=P``), keeping the proposal axis in channels
  instead of re-batching (no P*B activation transpose between convs).
* **batched-einsum head**: the FC layers run as P-batched (B,2000)@(2000,
  500) matmuls — the one place the plain path was already MXU-shaped.

``attach()`` installs it as the ``NNPosterior`` fast density
(forward-only: the reference's MNIST MTM protocols never differentiate the
superstep).  Rounding differs from the flax/XLA path by reassociation
only, but densities feed acceptance weights, so — like the fused LSTM
kernel — this is a *protocol field*: kernel-path and XLA-path chains must
never be spliced (``pmpx/experiments/mnist.py`` sidecars enforce it).

MEASURED RESULT (r5, paper-scale MP P=8 bf16 on v5e): 72.6 ms/superstep
with ``proposal_chunk=4`` and 75.7 ms at full P, vs 78.6 ms for the
plain NHWC path (``artifacts/nn_perf_cnnfast{,_fullp}/``) — only ~1.08x.
Per-proposal cost is linear in P on both paths, so the superstep is
dominated by per-proposal work that conv1's MXU tiling does NOT bound:
the profile is consistent with HBM traffic on the (B,24,24,10)-sized
activation round-trips (~2.5 GB/proposal), which this path reorganizes
but does not reduce.  Kept, like ``pmpx/kernels/convpack.py``, as a
measured-alternative with the numbers published; the paper-protocol CNN
cells stay on the plain XLA path.  Cutting that traffic needs a Pallas
fusion of conv1->pool->conv2 with VMEM-resident tiles (the LSTM-kernel
treatment) — hostile Mosaic shapes (10/20-channel lanes), left as the
known ~2x headroom.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

__all__ = ["make_fast_log_prob_batch", "attach"]


def _s2d_scatter_indices():
    """Index map scattering the (5,5) stride-1 taps into the (3,3,4)
    space-to-depth kernel, per output phase.

    For output phase (py,px) and tap (ky,kx), the contributing s2d input
    pixel sits at spatial offset (u,v)=((py+ky)//2,(px+kx)//2) in input
    phase d=((py+ky)%2, (px+kx)%2).  The map (ky -> (u,dy)) is injective
    for fixed py, so each target slot holds a single source tap.
    """
    ph, u, v, d, ky, kx = [], [], [], [], [], []
    for py in range(2):
        for px in range(2):
            for a in range(5):
                for b in range(5):
                    ph.append(py * 2 + px)
                    u.append((py + a) // 2)
                    v.append((px + b) // 2)
                    d.append(((py + a) % 2) * 2 + ((px + b) % 2))
                    ky.append(a)
                    kx.append(b)
    return tuple(np.asarray(i) for i in (ph, u, v, d, ky, kx))


_PH, _U, _V, _D, _KY, _KX = _s2d_scatter_indices()


def _space_to_depth(x):
    """(B, 28, 28) -> (B, 14, 14, 4) with phase channel d = dy*2+dx."""
    B = x.shape[0]
    x = x.reshape(B, 14, 2, 14, 2)
    return x.transpose(0, 1, 3, 2, 4).reshape(B, 14, 14, 4)


def _s2d_conv1_weights(w1):
    """(P, 5, 5, 10) flax conv1 kernels -> (3, 3, 4, P*4*10) s2d kernels
    with output channels ordered (proposal, phase, filter)."""
    P = w1.shape[0]
    out = jnp.zeros((P, 3, 3, 4, 4, 10), w1.dtype)
    # scatter the 25 live taps of each phase (100 slots of 144 total)
    out = out.at[:, _U, _V, _D, _PH, :].set(w1[:, _KY, _KX, :])
    return out.transpose(1, 2, 3, 0, 4, 5).reshape(3, 3, 4, P * 40)


def _forward_logits(params_b, x_s2d, dt):
    """All-P logits (P, B, 10) from vmapped flax param trees."""
    P = params_b["Conv_0"]["bias"].shape[0]
    B = x_s2d.shape[0]
    cast = (lambda a: a.astype(dt)) if dt is not None else (lambda a: a)
    w1 = cast(params_b["Conv_0"]["kernel"][:, :, :, 0, :])  # (P,5,5,10)
    b1 = cast(params_b["Conv_0"]["bias"])                   # (P,10)
    w2 = cast(params_b["Conv_1"]["kernel"])                 # (P,3,3,10,20)
    b2 = cast(params_b["Conv_1"]["bias"])                   # (P,20)
    wf1 = cast(params_b["Dense_0"]["kernel"])               # (P,2000,500)
    bf1 = cast(params_b["Dense_0"]["bias"])                 # (P,500)
    wf2 = cast(params_b["Dense_1"]["kernel"])               # (P,500,10)
    bf2 = cast(params_b["Dense_1"]["bias"])                 # (P,10)

    dn = ("NHWC", "HWIO", "NHWC")
    # conv1 as s2d conv: (B,14,14,4) x (3,3,4,P*40) -> (B,12,12,P*40)
    z = jax.lax.conv_general_dilated(
        x_s2d, _s2d_conv1_weights(w1), (1, 1), "VALID",
        dimension_numbers=dn,
    )
    # phase-max pooling + bias + relu (== conv1 -> relu -> maxpool 2x2/2)
    z = z.reshape(B, 12, 12, P, 4, 10).max(axis=4)
    z = jax.nn.relu(z + b1[None, None, None, :, :])

    # conv2: one feature-grouped conv, proposal-major channel blocks
    rhs2 = w2.transpose(1, 2, 3, 0, 4).reshape(3, 3, 10, P * 20)
    z = jax.lax.conv_general_dilated(
        z.reshape(B, 12, 12, P * 10), rhs2, (1, 1), "VALID",
        dimension_numbers=dn, feature_group_count=P,
    )  # (B,10,10,P*20)
    z = jax.nn.relu(
        z.reshape(B, 10, 10, P, 20) + b2[None, None, None, :, :]
    )

    # head: flax flattens (10,10,20) channels-last -> 2000
    act = z.transpose(3, 0, 1, 2, 4).reshape(P, B, 2000)
    h = jax.nn.relu(
        jnp.einsum("pbk,pko->pbo", act, wf1) + bf1[:, None, :]
    )
    return jnp.einsum("pbh,pho->pbo", h, wf2) + bf2[:, None, :]


def make_fast_log_prob_batch(posterior):
    """Build the MXU-shaped ``log_prob_batch(Theta)`` for an NNPosterior
    over ``pmpx.models.MnistCNN``.

    Reads ``posterior.X`` at trace time (so ``bound_data`` still threads
    the dataset through as a jit argument), honors ``compute_dtype`` the
    way ``NNPosterior._logits`` does (params and activations cast, loss
    reduction f32), and respects ``proposal_chunk`` as the activation-
    memory dial (the P-wide conv stack is the same total bytes as the
    vmapped path, so the same chunk setting keeps the same headroom).
    """
    unravel = posterior._unravel

    def logits_chunk(Theta_c, x_s2d):
        params_b = jax.vmap(unravel)(Theta_c)
        return _forward_logits(params_b, x_s2d, posterior.compute_dtype)

    def fast(Theta, key=None):
        X = posterior.X
        if X.ndim == 4:
            X = X[..., 0]
        x_s2d = _space_to_depth(X)
        P = Theta.shape[0]
        c = posterior.proposal_chunk
        if c is None or c >= P:
            logits = logits_chunk(Theta, x_s2d)
        else:
            if P % c:
                raise ValueError(
                    f"proposal_chunk={c} must divide the batch size {P}"
                )
            logits = jax.lax.map(
                lambda t: logits_chunk(t, x_s2d),
                Theta.reshape(P // c, c, Theta.shape[-1]),
            ).reshape(P, X.shape[0], 10)
        ce = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), posterior.Y[None, :]
        ).mean(axis=-1)
        return -posterior.temper * ce

    return fast


def attach(posterior) -> None:
    """Install the MXU-shaped density on an MnistCNN NNPosterior.

    After this ``log_prob_batch``/``log_prob`` evaluate through the
    space-to-depth path (identical math to flax up to float
    reassociation); ``value_and_grad_batch`` keeps the XLA route (the
    MNIST MTM protocols are gradient-free).
    """
    try:
        tree = posterior._unravel(posterior._theta0)
        k1 = tree["Conv_0"]["kernel"]
        k2 = tree["Conv_1"]["kernel"]
        _ = tree["Dense_0"]["kernel"], tree["Dense_1"]["kernel"]
        ok = k1.shape == (5, 5, 1, 10) and k2.shape == (3, 3, 10, 20)
    except (KeyError, TypeError):
        ok = False
    if not ok:
        raise ValueError(
            "attach() requires an NNPosterior over pmpx.models.MnistCNN "
            "(Conv_0 5x5x1x10 -> Conv_1 3x3x10x20 -> Dense_0 -> Dense_1)"
        )
    if posterior.stochastic:
        raise ValueError("fast CNN path is deterministic-only")
    posterior._fast_batch = make_fast_log_prob_batch(posterior)
