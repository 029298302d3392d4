"""Whole-chain Pallas megakernel for MP/PMP over Bayesian linreg.

Motivation (VERDICT r1): at small P the superstep's device time is an
op-launch floor — ~75 fused micro-ops of 0.2-0.8 us each (~14 us/iter at
P=4/n=500) — while the actual arithmetic is sub-microsecond.  The
reference's counterpart cost is worse (per-iteration H2D/D2H + kernel
launch, README.md:39-48), but the XLA scan still pays one launch per op
rather than per superstep.  This kernel erases the floor by running an
ENTIRE CHUNK OF THE CHAIN inside one ``pallas_call``: proposal-tree
generation (in-kernel PRNG, Box-Muller), likelihood, tree-walk weights,
categorical selection, and the parameter trace all live in
VMEM/registers for hundreds of supersteps per launch.

Layout: parameters on sublanes (rows 0..2 of an (8, L) block: beta0,
beta1, sigma), tree nodes on lanes, where ``L = max(P, 128)`` spans
multiple lane-tiles for P up to 1024.  Every structural operation
exploits the mixed-radix identity ``ancestor_i(x) = x mod 2^(i+1)``
(``pmpx.tree``), so the tree is built and walked by per-level lane
periodization (mask + slice + ``pltpu.repeat``) — no gathers, no
dynamic stores, and no per-level (P, P) constant matrices (the earlier
formulation's path/select/partner matmuls would cost 80 MB of VMEM at
P=1024).  The one constant matrix kept is the (L, L) triangular cumT
for the inverse-CDF prefix sum (4 MB VMEM at L=1024 — an MXU matmul
beat the log-step roll ladder by a wide margin on this hardware); the
per-iteration trace accumulates via a broadcast one-hot product.

Supported configs: binary prefetching trees (N=1, depth<=10, P<=1024),
flat MP (depth=1, N+1<=1024), and general (N, depth) multi-proposal
trees with power-of-two base N+1 (the reference's own convention,
N = 2**k - 1) — including the reference's flagship 512-node
N_step=7 x depth=3 cell (``conv_pmp.cu:85-88``).  The general walk
needs no gathers either: per level i the sibling-group sums (member
count, sum of positions, sum of squares, exp-weight total) are one
matmul against a constant (L, L) 0/1 group-membership matrix
``M_i[b, x] = [b < base**(i+1)][b = x (mod base**i)]``, which is
simultaneously the segmented reduction *and* the broadcast back to
every lane (the result is periodic in the group residue) — the
MXU-native form of ``conv_pmp.cu``'s host-built ``tran_table``.
Selection is one categorical draw (the root path of every reference
selection mode), stabilizer "none".  The in-kernel PRNG stream differs
from jax.random, so agreement with the XLA path is statistical
(tested) rather than bitwise.

``emit="all"`` additionally implements the reference's ESS-protocol
emission (``ess_per_s_MP.cu:265-278``: every proposal slot's resampled
draw is dumped each iteration, the first draw becoming the next state —
``selection="all_first"``).  Slots live on LANES: slot j's uniform is
lane j of one (1, L) PRNG row, the CDF is columnized once per step
(an iota-identity mask + lane reduction — no transpose op), and the
counting-select for all P slots is one (L, L) outer comparison
``k[j] = #{l: cdf[l] < u[j]}``.  The payoff of the lane orientation is
that ALL THREE selected coordinates then come from a single MXU matmul
``SELR = Y @ O2`` with the one-hot-columns matrix ``O2[l, j] = [l = k_j]``
— the same (8, L) @ (L, L) shape class as the inverse-CDF matmul — and
the previous-slot states for the within-step MSJD jump sum from one
more, ``SELR @ superdiag``.  Slot 0's column IS the next chain state
(``all_first``), so no separate root draw is needed.  The per-slot b0
stream is written by a per-step dynamic single-row store into a
(steps, L) output (the write analog of the proven ``pl.ds`` uniform
reads) — O(L) per step, not an O(L*steps) trace accumulate.  Root
state, within-step jump sum, and the last slot's state ride the
(8, steps) meta trace (rows 0-2 / 3 / 4-6), so the host can stitch
cross-step and cross-chunk boundary jumps exactly.

Reference counterparts: the per-iteration host loops of
``conv_mp.cu:180-264`` / ``500_MP.cu`` / ``500_PMP.cu`` — the cells where
launch+transfer overhead dominates the A100 numbers.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["supports", "make_fused_chain"]

_LANES = 128
_MAX_P = 1024
_LOG_2PI = math.log(2.0 * math.pi)


# VMEM budget for the per-level group matrices of the general walk
# (depth x (L, L) f32); conv_pmp's 512-node cell needs 3 MiB
_GROUP_MAT_BYTES = 8 * 2**20


def _lane_extent(P: int) -> int:
    """Lane-padded extent the kernel allocates for P proposals — the
    single definition both the VMEM predicate in :func:`supports` and
    :func:`make_fused_chain` must share."""
    return -(-max(P, _LANES) // _LANES) * _LANES


def supports(cfg, emit: str = "root") -> bool:
    """Whether this kernel implements cfg's sampler exactly.

    ``emit="all"`` (the reference ESS protocol's per-slot emission) caps
    P at 512: the per-step (L, L) compare/one-hot intermediates and the
    (chunk, L) emitted trace must fit VMEM next to the existing
    constants.  512 is the protocol's own largest P (``data_trans.py``).
    """
    base = cfg.N + 1
    P = base**cfg.depth
    if not (P <= _MAX_P and cfg.stabilizer == "none"):
        return False
    if emit == "all" and _lane_extent(P) > 512:
        return False
    if cfg.N == 1 or cfg.depth == 1:
        return True
    # general (N, depth): the lane periodization needs every period
    # base**(i+1) to divide the lane extent, i.e. a power-of-two base
    # (the reference's own N = 2**k - 1 convention); the group matrices
    # must fit VMEM
    if base & (base - 1):
        return False
    L = _lane_extent(P)
    return cfg.depth * L * L * 4 <= _GROUP_MAT_BYTES


def spec_to_cfg(spec):
    """The one place a SamplerSpec (algo mp|pmp) maps onto the kernel's
    PMPConfig — experiments comparing fused vs scan paths share it so
    step size / transition / stabilizer parameters can never
    desynchronize.  The stabilizer passes through so :func:`supports`
    rejects specs the kernel does not implement (it is stabilizer-free);
    selection is pinned to "all_first" because the kernel traces the
    root path, whose marginal law is one categorical draw under every
    reference selection mode."""
    from pmpx.samplers.pmp import PMPConfig

    return PMPConfig(
        N=spec.N,
        depth=spec.depth if spec.algo == "pmp" else 1,
        step_size=spec.step_size,
        trans_sigma=spec.trans_sigma,
        selection="all_first",
        stabilizer=spec.stabilizer,
    )


def _pad_grid(v: np.ndarray) -> jnp.ndarray:
    n = v.shape[0]
    rows = -(-n // _LANES)
    out = np.zeros((rows, _LANES), np.float32)
    out.reshape(-1)[:n] = v
    return jnp.asarray(out)


def _uniform(shape):
    """(0, 1] uniforms from raw PRNG bits (mantissa fill)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.int32)
    f = pltpu.bitcast(
        jax.lax.shift_right_logical(bits, 9) | jnp.int32(0x3F800000),
        jnp.float32,
    )  # [1, 2)
    return 2.0 - f  # (0, 1]


def _periodize(v, period, L):
    """Tile ``v``'s first ``period`` lanes periodically over all ``L``
    lanes: slice + ``pltpu.repeat`` (Mosaic rejects sub-tile lane
    concatenation, so no concat/pad tricks; doubling circular rolls work
    but cost ~30x — rolls that span lane-tiles are slow)."""
    if period >= L:
        return v
    block = jax.lax.slice_in_dim(v, 0, period, axis=1)
    return pltpu.repeat(block, L // period, axis=1)


def _dot(a, b):
    return jnp.dot(
        a, b,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _chain_kernel(
    seed_ref, theta0_ref, xg_ref, yg_ref, cumT_ref, Ms_ref, uin_ref,
    *refs,
    steps, P, L, depth, N, n_data, temper, step_size, trans_sigma,
    trans_norm, mode, rng, emit, ablate,
):
    if emit == "all":
        uemit_ref, shift_ref, trace_ref, all_ref = refs
    else:
        uemit_ref = shift_ref = all_ref = None
        (trace_ref,) = refs
    if rng == "kernel":
        pltpu.prng_seed(seed_ref[0])
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    valid = (lane < P).astype(jnp.float32)  # (1, L)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    row_valid = (row < 3).astype(jnp.float32)  # params live in rows 0..2
    lane0 = (lane == 0).astype(jnp.float32)
    t_iota = jax.lax.broadcasted_iota(jnp.int32, (1, steps), 1)
    slot = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0)  # sublane index
    if emit == "all":
        # loop-invariant helpers for the per-slot emission: the identity
        # mask that columnizes the CDF (no transpose op exists for a
        # (1, L) row), and the flattened-stream jump mask
        ident = (lane == slot).astype(jnp.float32)  # (L, L)
        jmask_row = jnp.logical_and(lane >= 1, lane < P).astype(
            jnp.float32
        )  # (1, L)

    # data sufficient statistics: the sums below are loop-invariant, so
    # Mosaic hoists them — one streaming pass over the (rows, 128) grids
    # per CHUNK (the padded tail is zero, so sums are exact).  This is the
    # in-kernel form of the target's "suffstats" strategy, algebraically
    # identical to the O(P*n) sweep.
    xg = xg_ref[...]
    yg = yg_ref[...]

    def step(t, carry):
        theta, trace = carry  # (8, 1), (8, steps)
        if rng == "kernel":
            u1 = _uniform((8, L))
            u2 = _uniform((8, L))
            usel = _uniform((1, L))
            if emit == "all":
                # per-slot thresholds: one PRNG row, slot j on lane j
                u_row = jax.lax.slice_in_dim(
                    _uniform((8, L)), 0, 1, axis=0
                )  # (1, L)
        else:
            # injected uniforms: 17 rows per step (8 + 8 + 1) — the
            # testable path (interpret mode stubs the hardware PRNG)
            u1 = uin_ref[pl.ds(t * 17, 8), :]
            u2 = uin_ref[pl.ds(t * 17 + 8, 8), :]
            usel = uin_ref[pl.ds(t * 17 + 16, 1), :]
            if emit == "all":
                u_row = uemit_ref[pl.ds(t, 1), :]  # (1, L)
        z = jnp.sqrt(-2.0 * jnp.log(u1)) * jnp.cos((2.0 * math.pi) * u2)
        eps = step_size * z * valid * row_valid  # (8, L)

        if mode in ("binary", "general"):
            # positions via the mixed-radix identity (pmpx.tree:
            # anc_index[i, x] = x mod base^(i+1)):
            #   Y[x] = theta + sum_i [digit_i(x) != 0] eps[x mod base^(i+1)]
            # level i's contribution is eps masked to its creation lanes
            # [base^i, base^(i+1)) made periodic — all full-width ops, no
            # path matrix, no gathers.
            base = N + 1
            S = jnp.zeros((8, L), jnp.float32)
            for i in range(depth):
                w = base**i
                born = jnp.logical_and(lane >= w, lane < base * w)
                S = S + _periodize(
                    eps * born.astype(jnp.float32), base * w, L
                )
        else:
            # flat MP: node x's position is theta + its own innovation
            # (root x=0 unmoved)
            S = eps * (lane != 0).astype(jnp.float32)
        Y = theta + S  # (8, L)

        sx = jnp.sum(xg)
        sy = jnp.sum(yg)
        sxx = jnp.sum(xg * xg)
        syy = jnp.sum(yg * yg)
        sxy = jnp.sum(xg * yg)
        b0 = Y[0:1, :]
        b1 = Y[1:2, :]
        sg = Y[2:3, :]
        rss = (
            syy + n_data * b0 * b0 + b1 * b1 * sxx
            + 2.0 * b0 * b1 * sx - 2.0 * b0 * sy - 2.0 * b1 * sxy
        )
        s2 = jnp.maximum(sg * sg, 1e-30)
        logpi = temper * (
            -0.5 * n_data * (_LOG_2PI + jnp.log(s2)) - rss / (2.0 * s2)
        )  # (1, L)

        if mode == "binary":
            # per level i: contribution[x] = log sigmoid(
            #   logpi[anc] - logpi[anc ^ 2^i]),  anc = x mod 2^(i+1).
            # sel_i = periodized low block of logpi; the xor partner of a
            # period-2^(i+1) periodic array is a circular roll by 2^i.
            logA = jnp.zeros((1, L), jnp.float32)
            for i in range(depth):
                w = 2**i
                sel = _periodize(
                    logpi * (lane < 2 * w).astype(jnp.float32), 2 * w, L
                )
                par = pltpu.roll(sel, shift=w, axis=1)
                logA = logA + jax.nn.log_sigmoid(sel - par)
        elif mode == "general":
            # general (N, depth) walk (log_accept_tree semantics,
            # error.py:160-173 / conv_pmp.cu:10-36): per level i the
            # sibling group of residue h is {h + j*temp}; the MTM weight
            # is lw[h,j] = logpi - sum_k |Y_j - Y_k|^2/(2 s^2 norm)
            # (constant log-K terms are uniform within a group and
            # cancel in its normalization).  Each group-segmented sum is
            # ONE matmul against the constant membership matrix M_i,
            # whose result is already broadcast lane-wise (periodic in
            # the residue); the level factor for every deeper node
            # follows by m-periodization — no gathers, no tran_table.
            base = N + 1
            logA = jnp.zeros((1, L), jnp.float32)
            sq = jnp.sum(Y * Y, axis=0, keepdims=True)  # (1, L)
            for i in range(depth):
                temp = base**i
                m = temp * base
                Mi = Ms_ref[pl.ds(i * L, L), :]  # (L, L) 0/1
                Sg = _dot(Y, Mi)  # (8, L) per-group position sums
                qg = _dot(sq, Mi)  # (1, L) per-group square sums
                gd2 = (
                    base * sq
                    - 2.0 * jnp.sum(Y * Sg, axis=0, keepdims=True)
                    + qg
                )
                lw = logpi - gd2 / (
                    2.0 * trans_sigma * trans_sigma * trans_norm
                )
                # group-normalize with a level-global shift: exact up to
                # the shift (uniform per group), underflow-guarded
                zm = jnp.max(jnp.where(lane < m, lw, -1e30))
                e = jnp.exp(lw - zm) * (lane < m).astype(jnp.float32)
                T = jnp.maximum(_dot(e, Mi), 1e-30)  # periodic in temp
                logA = logA + _periodize(lw, m, L) - zm - jnp.log(T)
        else:
            # flat MTM: lw_j = logpi_j + sum_{k!=j} log K(Y_j -> Y_k); the
            # per-pair constant is uniform across j and cancels in the
            # group normalization, leaving the pairwise distances
            # sum_k ||Yj - Yk||^2 = P ||Yj||^2 - 2 Yj.S + Q  (O(P d))
            sq = jnp.sum(Y * Y, axis=0, keepdims=True)  # (1, L)
            Ssum = jnp.sum(Y * valid, axis=1, keepdims=True)  # (8, 1)
            Q = jnp.sum(sq * valid)
            cross = jnp.sum(Y * Ssum, axis=0, keepdims=True)  # (1, L)
            sum_d2 = P * sq - 2.0 * cross + Q
            lw = logpi - sum_d2 / (2.0 * trans_sigma * trans_sigma
                                   * trans_norm)
            m = jnp.max(jnp.where(lane < P, lw, -1e30))
            logA = lw - (m + jnp.log(jnp.sum(jnp.exp(lw - m) * valid)))

        # one categorical draw (the root path of every selection mode)
        zmax = jnp.max(jnp.where(lane < P, logA, -1e30))
        w = jnp.exp(logA - zmax) * valid  # (1, L)
        cdf = _dot(w, cumT_ref[...])  # inclusive prefix sums (MXU)
        hit = (t_iota == t).astype(jnp.float32)  # (1, steps)
        if emit == "all":
            # P iid categorical draws (selection="all_first": slot 0's
            # draw becomes the next state).  Slots live on LANES: the
            # counting-select runs for all of them at once as one
            # (L, L) outer comparison of the columnized CDF against the
            # threshold row — searchsorted side="left" exactly, like the
            # root path's count.  Padded lanes l >= P have
            # cdf[l] = wsum >= u, so they never inflate a count.
            # ``ablate`` (perf instrumentation, scripts/emit_ablation.py)
            # truncates the emission pipeline after stage k, keeping the
            # partial result live through a 1e-30 trace contribution.
            wsum = jnp.sum(w)
            tiny = jnp.sum(u_row)
            if ablate >= 2:
                cdf_col = jnp.sum(ident * cdf, axis=1,
                                  keepdims=True)  # (L, 1)
                tiny = jnp.sum(cdf_col)
            if ablate >= 3:
                cnt = jnp.sum(
                    (cdf_col < u_row * wsum).astype(jnp.float32),
                    axis=0, keepdims=True,
                )
                k_row = jnp.minimum(cnt, float(P - 1))  # (1, L)
                tiny = jnp.sum(k_row)
            if ablate >= 4:
                # per-slot selected states: ONE MXU matmul against the
                # one-hot-columns matrix — all three coordinates at once
                O2 = (slot.astype(jnp.float32) == k_row).astype(
                    jnp.float32
                )
                SELR = _dot(Y, O2)  # (8, L): column j = slot j's draw
                # slot 0's draw IS the next state (all_first)
                theta2e = jax.lax.slice_in_dim(SELR, 0, 1, axis=1)
                tiny = jnp.sum(SELR)
            if ablate >= 5:
                # within-step flattened-stream jumps (slot j-1 -> j):
                # the previous slot's states via one superdiag matmul
                PREV = _dot(SELR, shift_ref[...])  # (8, L)
                D = SELR - PREV
                J = jnp.sum(jmask_row * D * D)
                tiny = J
            if ablate >= 6:
                # last slot's state, rows 0-2 rolled to meta rows 4-6
                lastc = pltpu.roll(
                    jax.lax.slice_in_dim(SELR, P - 1, P, axis=1),
                    shift=4, axis=0,
                )  # (8, 1)
                # meta trace rows: 0-2 root state, 3 within-step jump
                # sum, 4-6 last slot's state (host boundary jumps)
                rowf = row.astype(jnp.float32)
                upd = theta2e + J * (rowf == 3.0) + lastc
                trace2e = trace + upd * hit
            if ablate >= 7:
                # per-slot b0 stream: O(L) dynamic single-row store (the
                # write analog of the pl.ds uniform reads above)
                all_ref[pl.ds(t, 1), :] = jax.lax.slice_in_dim(
                    SELR, 0, 1, axis=0
                )
                return theta2e, trace2e
            if ablate == 6:
                return theta2e, trace2e
            # ablation fallthrough (stages 1-5): chain via the root
            # select below, folding the truncated stage's output into
            # the trace at 1e-30 so Mosaic cannot dead-code it
            trace = trace + (1e-30 * tiny) * hit
        u = jnp.sum(usel * lane0) * jnp.sum(w)
        # select the first lane with cdf >= u by *counting* lanes below u
        # (np.searchsorted side="left" + clamp, exactly).  An interval
        # test like (cdf - w < u) & (cdf >= u) recomputes each lane's
        # lower edge in f32 and can select zero or two lanes whenever the
        # recomputed edge differs from the neighbor's cdf by an ulp; the
        # count is immune to that and to u landing past cdf[-1].
        k = jnp.minimum(
            jnp.sum((cdf < u).astype(jnp.float32)), float(P - 1)
        )
        onehot = (lane.astype(jnp.float32) == k).astype(jnp.float32)
        theta2 = jnp.sum(Y * onehot * valid, axis=1, keepdims=True)
        trace2 = trace + theta2 * hit
        return theta2, trace2

    theta0 = theta0_ref[...][:, 0:1] * row_valid
    _, trace = jax.lax.fori_loop(
        0, steps, step, (theta0, jnp.zeros((8, steps), jnp.float32))
    )
    trace_ref[...] = trace


def make_fused_chain(
    target, cfg, *, chunk: int = 512, interpret=False, rng: str = "kernel",
    emit: str = "root", _ablate: int = 7,
):
    """Build ``run(key, theta0, num_steps) -> trace (num_steps, 3)``.

    ``target`` must be a BayesLinReg; ``cfg`` a PMPConfig satisfying
    ``supports(cfg, emit)``.  The chain runs ``num_steps`` supersteps in
    ``ceil(num_steps/chunk)`` kernel launches under one jit; the returned
    trace row t is the chain state after superstep t (the root path —
    reference ``conv_*.cu`` logs exactly this).

    ``emit="all"`` implements the reference's ESS-protocol emission
    (``ess_per_s_MP.cu:265-278``): ``run`` instead returns a dict with

    * ``root``  (num_steps, 3) — the chain path (slot 0's draw);
    * ``emit_b0`` (P, num_steps) — beta0 of every slot's draw, the
      per-slot streams the protocol's ESS sums over;
    * ``jumps`` (num_steps,) — within-step flattened-stream squared-jump
      sums (slots 0->1..P-2->P-1, all 3 coordinates);
    * ``last``  (num_steps, 3) — the last slot's draw, so the host adds
      the step/chunk boundary jumps ``||last[t] - root[t+1]||^2``.

    Callers should keep ``num_steps`` per call modest (the emitted
    streams are materialized on device); the ESS experiment loops calls
    of ``emit_chunk`` supersteps and spools to a host memmap.

    ``rng="kernel"`` (production) draws uniforms from the in-kernel
    hardware PRNG; ``rng="input"`` injects jax.random uniforms from the
    host — bit-exactly testable against a NumPy oracle, incl. on CPU in
    interpret mode where the hardware PRNG is stubbed.
    """
    if not supports(cfg, emit):
        raise ValueError(f"fused chain does not support {cfg} emit={emit}")
    if interpret is False and jax.default_backend() != "tpu":
        # non-TPU fallback: interpret mode stubs the hardware PRNG to
        # zeros, so switch to host-injected uniforms (slower, same math)
        interpret = pltpu.InterpretParams()
        if rng == "kernel":
            rng = "input"
    P = (cfg.N + 1) ** cfg.depth
    # lane extent: full lane-tiles only (a flat-MP P like 200 would
    # otherwise give every array a non-128-multiple lane dim — untested
    # Mosaic layout territory); binary P is a power of two, so the
    # pow-2 periods of _periodize always divide L
    L = _lane_extent(P)
    if cfg.N == 1:
        mode = "binary"
    elif cfg.depth == 1:
        mode = "mp"
    else:
        mode = "general"

    xg = _pad_grid(np.asarray(target.x, np.float32))
    yg = _pad_grid(np.asarray(target.y, np.float32))
    cumT = jnp.asarray(np.triu(np.ones((L, L), np.float32)))
    if mode == "general":
        # stacked per-level group-membership matrices:
        # Ms[i*L + b, x] = 1 iff b < base**(i+1) and b = x (mod base**i)
        base = cfg.N + 1
        bb = np.arange(L)[:, None]
        xx = np.arange(L)[None, :]
        Ms = np.concatenate(
            [
                (
                    (bb < base ** (i + 1))
                    & ((bb % base**i) == (xx % base**i))
                ).astype(np.float32)
                for i in range(cfg.depth)
            ],
            axis=0,
        )
        Ms = jnp.asarray(Ms)
    else:
        Ms = jnp.zeros((8, _LANES), jnp.float32)  # unused placeholder

    trans_norm = cfg.trans_normalize_by
    if trans_norm == 0:
        trans_norm = float(target.d)

    if emit == "all":
        # superdiagonal: PREV = SELR @ Shift is a right-multiply, so
        # PREV[:, j] = sum_l SELR[:, l] Shift[l, j] = SELR[:, j-1] needs
        # Shift[l, j] = [j == l+1] (k=+1); column 0 comes out zero and is
        # masked by jmask_row
        ShiftM = jnp.asarray(np.eye(L, k=1, dtype=np.float32))

    def one_chunk(seed, theta0, uin, uemit, steps):
        kern = functools.partial(
            _chain_kernel,
            steps=steps, P=P, L=L, depth=cfg.depth, N=cfg.N,
            n_data=float(target.n), temper=float(target.temper),
            step_size=float(cfg.step_size),
            trans_sigma=float(cfg.trans_sigma),
            trans_norm=float(trans_norm), mode=mode, rng=rng, emit=emit,
            ablate=_ablate,
        )
        n_in = 7 if emit != "all" else 9
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + [
            pl.BlockSpec(memory_space=pltpu.VMEM)
        ] * (n_in - 1)
        if emit == "all":
            out_specs = (
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            out_shape = (
                jax.ShapeDtypeStruct((8, steps), jnp.float32),
                jax.ShapeDtypeStruct((steps, L), jnp.float32),
            )
            extra = (uemit, ShiftM)
        else:
            out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
            out_shape = jax.ShapeDtypeStruct((8, steps), jnp.float32)
            extra = ()
        return pl.pallas_call(
            kern,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=interpret,
        )(seed, theta0, xg, yg, cumT, Ms, uin, *extra)

    @functools.partial(jax.jit, static_argnames=("num_steps",))
    def run(key, theta0, num_steps: int):
        n_chunks = -(-num_steps // chunk)
        if emit == "all":
            k_seed, k_u, k_e = jax.random.split(key, 3)
        else:
            k_seed, k_u = jax.random.split(key)
        seeds = jax.random.randint(
            k_seed, (n_chunks, 1), 0, np.iinfo(np.int32).max, jnp.int32
        )
        if rng == "input":
            # uniforms in (0, 1]: 17 rows of L lanes per superstep
            uin = 1.0 - jax.random.uniform(
                k_u, (n_chunks, chunk * 17, L), jnp.float32
            )
        else:
            uin = jnp.zeros((n_chunks, 1, L), jnp.float32)
        if emit == "all" and rng == "input":
            # per-slot draws, lane-oriented: row t holds superstep t's L
            # thresholds (slot j on lane j), matching the kernel's
            # uemit_ref[pl.ds(t, 1), :] row read
            uem = 1.0 - jax.random.uniform(
                k_e, (n_chunks, chunk, L), jnp.float32
            )
        else:
            uem = jnp.zeros((n_chunks, 8, _LANES), jnp.float32)
        th0 = jnp.zeros((8, _LANES), jnp.float32)
        th0 = th0.at[:3, 0].set(theta0.astype(jnp.float32))

        def body(carry, inp):
            seed, u, ue = inp
            tr = one_chunk(seed, carry, u, ue, chunk)
            meta = tr[0] if emit == "all" else tr  # (8, chunk)
            th = jnp.zeros((8, _LANES), jnp.float32).at[:3, 0].set(
                meta[:3, -1]
            )
            return th, tr

        _, traces = jax.lax.scan(body, th0, (seeds, uin, uem))
        if emit == "all":
            metas, alls = traces  # (n_chunks, 8, chunk), (n_chunks, chunk, L)
            flat = jnp.transpose(metas, (0, 2, 1)).reshape(-1, 8)
            return {
                "root": flat[:num_steps, :3],
                "jumps": flat[:num_steps, 3],
                "last": flat[:num_steps, 4:7],
                "emit_b0": alls.reshape(-1, L)[:num_steps, :P].T,
            }
        # (n_chunks, 8, chunk) -> (n_chunks*chunk, 3)
        out = jnp.transpose(traces, (0, 2, 1)).reshape(-1, 8)[:, :3]
        return out[:num_steps]

    return run
