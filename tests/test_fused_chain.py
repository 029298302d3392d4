"""Fused chain-in-kernel megakernel: exact math validation.

The production kernel draws from the on-core hardware PRNG (not runnable
under the CPU interpreter, which stubs it to zeros), so correctness is
proven on the ``rng="input"`` path: identical host-supplied uniforms feed
both the Pallas kernel (interpret mode) and a NumPy step-by-step oracle;
every superstep of the trace must agree.  This validates positions
(path-matrix matmul), likelihood (suffstats), the binary walk, the flat
MTM weights, and the inverse-CDF selection — everything except the PRNG
itself, which is validated statistically on real TPU
(``artifacts/time/fused_chain*``)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pmpx import tree as tree_mod
from pmpx.kernels import fused_chain as fc
from pmpx.samplers.pmp import PMPConfig
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg

LOG_2PI = math.log(2.0 * math.pi)


def _oracle_step(target, cfg, consts, theta, u1, u2):
    """One superstep's (Y, logA) in float64 — shared by the root-path
    and emit-all oracles."""
    P = (cfg.N + 1) ** cfg.depth
    xs = np.arange(P)
    PM, sx, sy, sxx, syy, sxy = consts
    n = target.n
    temper = target.temper
    norm = cfg.trans_normalize_by or 3.0
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * math.pi * u2)
    eps = cfg.step_size * z  # (3, P)
    Y = theta[:, None] + eps @ PM.T  # (3, P)
    b0, b1, sg = Y
    rss = (
        syy + n * b0 * b0 + b1 * b1 * sxx
        + 2 * b0 * b1 * sx - 2 * b0 * sy - 2 * b1 * sxy
    )
    s2 = np.maximum(sg * sg, 1e-30)
    logpi = temper * (-0.5 * n * (LOG_2PI + np.log(s2)) - rss / (2 * s2))
    if cfg.N == 1:
        logA = np.zeros(P)
        for i in range(cfg.depth):
            anc = xs & (2 ** (i + 1) - 1)
            part = anc ^ (2**i)
            dh = logpi[anc] - logpi[part]
            logA = logA - np.logaddexp(0.0, -dh)  # log sigmoid
    elif cfg.depth > 1:
        # general (N, depth) per-level normalized MTM walk
        # (log_accept_tree semantics)
        base = cfg.N + 1
        logA = np.zeros(P)
        for i in range(cfg.depth):
            temp = base**i
            m = temp * base
            lp = logpi[:m].reshape(base, temp).T  # (temp, base)
            G = Y[:, :m].reshape(3, base, temp).transpose(2, 1, 0)
            d2 = ((G[:, :, None, :] - G[:, None, :, :]) ** 2).sum(-1)
            lw = lp - d2.sum(-1) / (2 * cfg.trans_sigma**2 * norm)
            mx = lw.max(axis=1, keepdims=True)
            contrib = lw - (
                mx + np.log(np.exp(lw - mx).sum(1, keepdims=True))
            )
            logA = logA + np.tile(contrib.T.reshape(m), P // m)
    else:
        sq = (Y * Y).sum(0)
        S = Y.sum(1)
        Q = sq.sum()
        sum_d2 = P * sq - 2.0 * (Y * S[:, None]).sum(0) + Q
        lw = logpi - sum_d2 / (2 * cfg.trans_sigma**2 * norm)
        m = lw.max()
        logA = lw - (m + np.log(np.exp(lw - m).sum()))
    return Y, logA


def _oracle_consts(target, cfg):
    P = (cfg.N + 1) ** cfg.depth
    topo = tree_mod.topology(cfg.N, cfg.depth)
    PM = topo.path_matrix[:P, :P]  # (P, P)
    x64 = np.asarray(target.x, np.float64)
    y64 = np.asarray(target.y, np.float64)
    return (
        PM, x64.sum(), y64.sum(),
        (x64 * x64).sum(), (y64 * y64).sum(), (x64 * y64).sum(),
    )


def oracle(target, cfg, uin, theta0, num_steps, chunk):
    P = (cfg.N + 1) ** cfg.depth
    consts = _oracle_consts(target, cfg)
    theta = np.asarray(theta0, np.float64)
    trace = np.zeros((num_steps, 3))
    for t in range(num_steps):
        c, tt = divmod(t, chunk)
        u1 = np.asarray(uin[c, tt * 17: tt * 17 + 8], np.float64)[:3, :P]
        u2 = np.asarray(
            uin[c, tt * 17 + 8: tt * 17 + 16], np.float64
        )[:3, :P]
        usel = float(uin[c, tt * 17 + 16, 0])
        Y, logA = _oracle_step(target, cfg, consts, theta, u1, u2)
        w = np.exp(logA - logA.max())
        cdf = np.cumsum(w)
        u = usel * w.sum()
        idx = int(np.searchsorted(cdf, u, side="left"))
        idx = min(idx, P - 1)
        theta = Y[:, idx]
        trace[t] = theta
    return trace


def oracle_emit(target, cfg, uin, uemit, theta0, num_steps, chunk):
    """Emit-all oracle: P searchsorted draws per superstep (slot 0 is
    the next state), per-slot beta0 streams, within-step squared-jump
    sums, and each step's last-slot state."""
    P = (cfg.N + 1) ** cfg.depth
    consts = _oracle_consts(target, cfg)
    theta = np.asarray(theta0, np.float64)
    root = np.zeros((num_steps, 3))
    emit_b0 = np.zeros((P, num_steps))
    jumps = np.zeros(num_steps)
    last = np.zeros((num_steps, 3))
    for t in range(num_steps):
        c, tt = divmod(t, chunk)
        u1 = np.asarray(uin[c, tt * 17: tt * 17 + 8], np.float64)[:3, :P]
        u2 = np.asarray(
            uin[c, tt * 17 + 8: tt * 17 + 16], np.float64
        )[:3, :P]
        ucol = np.asarray(uemit[c, tt, :P], np.float64)  # (P,)
        Y, logA = _oracle_step(target, cfg, consts, theta, u1, u2)
        w = np.exp(logA - logA.max())
        cdf = np.cumsum(w)
        ks = np.minimum(
            np.searchsorted(cdf, ucol * w.sum(), side="left"), P - 1
        )
        sel = Y[:, ks]  # (3, P)
        emit_b0[:, t] = sel[0]
        jumps[t] = ((sel[:, 1:] - sel[:, :-1]) ** 2).sum()
        last[t] = sel[:, -1]
        theta = sel[:, 0]
        root[t] = theta
    return root, emit_b0, jumps, last


@pytest.mark.parametrize(
    "cfg",
    [
        PMPConfig(N=1, depth=2, step_size=0.05, selection="all_first"),
        PMPConfig(N=1, depth=5, step_size=0.05, selection="all_first"),
        PMPConfig(N=7, depth=1, step_size=0.05, selection="all_first"),
        PMPConfig(N=31, depth=1, step_size=0.05, selection="all_first"),
        PMPConfig(N=1, depth=8, step_size=0.05, selection="all_first"),
        PMPConfig(N=1, depth=10, step_size=0.05, selection="all_first"),
        PMPConfig(N=255, depth=1, step_size=0.05, selection="all_first"),
        PMPConfig(N=199, depth=1, step_size=0.05, selection="all_first"),
        PMPConfig(N=3, depth=2, step_size=0.05, selection="all_first"),
        PMPConfig(N=3, depth=3, step_size=0.05, selection="all_first"),
        PMPConfig(N=7, depth=2, step_size=0.05, selection="all_first"),
        # the reference's flagship conv_pmp.cu cell: N_step=7, depth=3,
        # 512 speculative states (conv_pmp.cu:85-88)
        PMPConfig(N=7, depth=3, step_size=0.05, selection="all_first"),
    ],
    ids=["binary-P4", "binary-P32", "mp-P8", "mp-P32",
         "binary-P256", "binary-P1024", "mp-P256", "mp-P200",
         "gen-N3D2-P16", "gen-N3D3-P64", "gen-N7D2-P64",
         "gen-N7D3-P512-convpmp"],
)
def test_fused_chain_matches_numpy_oracle(cfg):
    x, y = make_synthetic_linreg(jax.random.key(0), 1000)
    target = BayesLinReg(x, y, temper=0.05, method="fused")
    chunk, steps = 16, 48
    run = fc.make_fused_chain(
        target, cfg, chunk=chunk, rng="input",
        interpret=pltpu.InterpretParams(),
    )
    key = jax.random.key(3)
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    got = np.asarray(run(key, theta0, steps))

    # regenerate the exact injected uniforms the run used
    n_chunks = -(-steps // chunk)
    _, k_u = jax.random.split(key)
    L = -(-max((cfg.N + 1) ** cfg.depth, 128) // 128) * 128
    uin = 1.0 - np.asarray(
        jax.random.uniform(k_u, (n_chunks, chunk * 17, L), jnp.float32)
    )
    want = oracle(target, cfg, uin, theta0, steps, chunk)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "cfg,seed",
    [
        (PMPConfig(N=1, depth=5, step_size=0.05, selection="all_first"),
         3),
        (PMPConfig(N=7, depth=1, step_size=0.05, selection="all_first"),
         5),
        (PMPConfig(N=1, depth=8, step_size=0.05, selection="all_first"),
         9),
        (PMPConfig(N=3, depth=2, step_size=0.05, selection="all_first"),
         5),
        # the ESS protocol's largest cell: P=512 (binary depth 9)
        (PMPConfig(N=1, depth=9, step_size=0.05, selection="all_first"),
         8),
    ],
    ids=["binary-P32", "mp-P8", "binary-P256", "gen-N3D2-P16",
         "binary-P512"],
)
def test_fused_chain_emit_all_matches_numpy_oracle(cfg, seed):
    x, y = make_synthetic_linreg(jax.random.key(0), 1000)
    target = BayesLinReg(x, y, temper=0.05, method="fused")
    chunk, steps = 8, 24
    run = fc.make_fused_chain(
        target, cfg, chunk=chunk, rng="input", emit="all",
        interpret=pltpu.InterpretParams(),
    )
    # the per-config seed is tie-free: the kernel's f32 CDF vs the
    # oracle's f64 one can pick adjacent nodes when a draw lands within
    # an ulp of a CDF edge (~1e-4/draw at P=512) — a distribution-level
    # non-event but a pointwise mismatch; with a fixed key the
    # comparison is deterministic, so tie-free stays tie-free
    key = jax.random.key(seed)
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    out = run(key, theta0, steps)

    # regenerate the exact injected uniforms the run used
    n_chunks = -(-steps // chunk)
    P = (cfg.N + 1) ** cfg.depth
    L = -(-max(P, 128) // 128) * 128
    _, k_u, k_e = jax.random.split(key, 3)
    uin = 1.0 - np.asarray(
        jax.random.uniform(k_u, (n_chunks, chunk * 17, L), jnp.float32)
    )
    uemit = 1.0 - np.asarray(
        jax.random.uniform(k_e, (n_chunks, chunk, L), jnp.float32)
    )
    root, emit_b0, jumps, last = oracle_emit(
        target, cfg, uin, uemit, theta0, steps, chunk
    )
    np.testing.assert_allclose(
        np.asarray(out["root"]), root, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["emit_b0"]), emit_b0, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["last"]), last, rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["jumps"]), jumps, rtol=5e-3, atol=1e-6
    )
    # slot 0's stream IS the root path (all_first)
    np.testing.assert_allclose(
        np.asarray(out["emit_b0"])[0], np.asarray(out["root"])[:, 0],
        rtol=0, atol=0,
    )


def test_supports_predicate():
    ok = PMPConfig(N=1, depth=7, step_size=0.1)
    assert fc.supports(ok)
    assert fc.supports(PMPConfig(N=1, depth=10, step_size=0.1))  # P=1024
    assert not fc.supports(PMPConfig(N=1, depth=11, step_size=0.1))
    # general (N, depth) trees with power-of-two base are in
    assert fc.supports(PMPConfig(N=3, depth=2, step_size=0.1))
    assert fc.supports(PMPConfig(N=7, depth=3, step_size=0.1))  # conv_pmp
    assert fc.supports(PMPConfig(N=31, depth=2, step_size=0.1))  # P=1024
    # non-power-of-two base falls back to the scan path
    assert not fc.supports(PMPConfig(N=2, depth=2, step_size=0.1))
    # group matrices past the VMEM budget fall back too
    assert not fc.supports(PMPConfig(N=3, depth=5, step_size=0.1))
    assert not fc.supports(
        PMPConfig(N=1, depth=3, step_size=0.1, stabilizer="zscore")
    )
    # emit-all caps at P=512 (the ESS protocol's own largest cell)
    assert fc.supports(
        PMPConfig(N=1, depth=9, step_size=0.1), emit="all"
    )
    assert fc.supports(
        PMPConfig(N=511, depth=1, step_size=0.1), emit="all"
    )
    assert not fc.supports(
        PMPConfig(N=1, depth=10, step_size=0.1), emit="all"
    )
