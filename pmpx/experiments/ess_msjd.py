"""ESS/s and MSJD/s vs. parallelism P.

Parity with ``simple_net/MP_and_PMP_ESS_per_sec_and_MSJD_per_sec/``: the
reference dumps million-step MP/PMP sample streams per P in
{8..512} (``data_trans.py:8``) and computes ESS/MSJD offline with code not
in the repo.  Here the whole pipeline is on-device: run, time, compute ESS
(Geyer) and MSJD per second, emit the machine-readable table behind
``ess_compare.pdf``/``msjd_compare.pdf``.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from pmpx import tree
from pmpx.config import SamplerSpec
from pmpx.experiments._common import as_tuple
from pmpx.metrics import ess, ess_chunked, ess_per_dim, msjd
from pmpx.metrics.recorder import save_trace
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg


def _emit_all_cell(
    target, spec, theta0, num_steps, burn_in, emit_chunk, out_dir,
    seed, keep_emit, tag,
):
    """One emit-all protocol cell: returns
    (root_ess, root_msjd_sum, all_ess, all_msjd_sum, wall_s)."""
    import os

    from pmpx.samplers.base import run_chain

    superstep = spec.build(target)

    # The device->host emission is the protocol's dominant traffic, so
    # only the (P,) beta0 column of every superstep crosses the tunnel;
    # MSJD over the flattened emitted stream (which needs all
    # coordinates) is reduced ON DEVICE per chunk — sum of squared
    # jumps inside the chunk plus the chunk's first/last emitted states
    # for the cross-chunk boundary jumps.
    def make_runner(n):
        @jax.jit
        def f(k, t, start):
            theta2, samples_all = run_chain(
                superstep, k, t, n,
                collect=lambda th, o: o["samples"],
            )
            flat = samples_all.reshape(-1, samples_all.shape[-1])
            d = flat[1:] - flat[:-1]
            # count only post-burn-in jumps (stream element i jumps to
            # i+1; kept iff its global flattened index >= burn_in*P), so
            # the MSJD numerator matches the burn_in-trimmed windows the
            # ESS estimators use — `start` is traced, no per-chunk
            # recompile
            P_ = flat.shape[0] // n
            gidx = jnp.arange(flat.shape[0] - 1) + start * P_
            keep = gidx >= burn_in * P_
            sq = jnp.sum(jnp.where(keep[:, None], d * d, 0.0))
            return (
                theta2,
                samples_all[:, :, 0],  # (n, P) beta0 of every draw
                samples_all[:, 0, :],  # (n, 3) the root path
                sq, flat[0], flat[-1],
            )

        return f

    os.makedirs(out_dir, exist_ok=True)
    colpath = os.path.join(out_dir, f"emit_{tag}.npy")
    P = (spec.N + 1) ** spec.depth if spec.algo == "pmp" else spec.N + 1
    cols = np.lib.format.open_memmap(
        colpath, mode="w+", dtype=np.float32, shape=(P, num_steps)
    )
    roots = np.empty((num_steps, 3), np.float32)
    theta = theta0
    key = jax.random.key(seed)
    # compile outside the timed window, like the root protocol's
    # untimed warm-up call (the results are discarded; the timed loop
    # restarts from theta0 with the same keys).  Every chunk shape the
    # loop will see is warmed here — including the tail when
    # num_steps % emit_chunk != 0 — so no compile lands inside dt.
    runners = {}
    shapes = {min(emit_chunk, num_steps)}
    if num_steps % emit_chunk:
        shapes.add(num_steps % emit_chunk)
    for n in sorted(shapes):
        runners[n] = make_runner(n)
        jax.block_until_ready(runners[n](
            jax.random.fold_in(key, 0), theta, jnp.int32(0)
        ))
    sq_sum, last = 0.0, None
    t0 = time.perf_counter()
    for s in range(0, num_steps, emit_chunk):
        n = min(emit_chunk, num_steps - s)
        theta, cols_c, roots_c, sq, first, lastc = runners[n](
            jax.random.fold_in(key, s), theta, jnp.int32(s)
        )
        cols[:, s:s + n] = np.asarray(cols_c).T
        roots[s:s + n] = np.asarray(roots_c)
        sq_sum += float(sq)
        if last is not None and s > burn_in:
            # boundary jump (last of prev chunk -> first of this one);
            # its earlier element has global index s*P - 1, which is
            # post-burn-in iff s > burn_in
            d = np.asarray(first, np.float64) - last
            sq_sum += float((d * d).sum())
        last = np.asarray(lastc, np.float64)
    dt = time.perf_counter() - t0
    return _finish_emit_cell(
        roots, cols, colpath, sq_sum, burn_in, num_steps, dt, keep_emit
    )


def _finish_emit_cell(
    roots, cols, colpath, sq_sum, burn_in, num_steps, dt, keep_emit
):
    """Shared estimator tail of both emit-all paths: root ESS/MSJD,
    per-draw-slot stream ESS sum, flattened-stream MSJD numerator."""
    import os

    P = cols.shape[0]
    n_tail = num_steps - burn_in
    # past ~256k steps the 2n-padded device FFT transient dominates the
    # analysis stage; the chunked host estimator is numerically the same
    # (Geyer truncation inside its adaptive window) at O(block) memory
    long_stream = n_tail >= (1 << 18)
    if long_stream:
        root_e = ess_chunked(roots[burn_in:, 0])
    else:
        root_e = float(ess(jnp.asarray(roots[burn_in:, 0])))
    root_m = float(msjd(jnp.asarray(roots[burn_in:]))) * (
        num_steps - burn_in
    )
    # per-draw-slot stream ESS (the reference's dump streams as chains),
    # batched so the FFTs stay within device memory
    all_e = 0.0
    if long_stream:
        for j in range(P):
            all_e += ess_chunked(cols[j, burn_in:])
    else:
        B = 16
        for j in range(0, P, B):
            blk = jnp.asarray(cols[j:j + B, burn_in:].T)  # (n, <=B)
            all_e += float(jnp.sum(ess_per_dim(blk)))
    all_m = sq_sum  # MSJD-rate numerator over the flattened stream
    del cols
    if not keep_emit:
        os.remove(colpath)
    return root_e, root_m, all_e, all_m, dt


def _emit_all_cell_fused(
    target, spec, theta0, num_steps, burn_in, emit_chunk, out_dir,
    seed, keep_emit, tag,
):
    """The emit-all protocol cell on the production megakernel: the
    per-slot draws, the root path, the within-step squared-jump sums,
    and each step's last-slot state all come out of the Pallas kernel
    (``fused_chain.make_fused_chain(emit="all")``); the host stitches
    the step/chunk boundary jumps ``||last[t] - root[t+1]||^2`` and runs
    the same estimator tail as the scan cell."""
    import os

    from pmpx.kernels import fused_chain as fc

    cfg = fc.spec_to_cfg(spec)
    P = (cfg.N + 1) ** cfg.depth
    kchunk = 500
    # emit_chunk a multiple of the kernel chunk so the inner pallas_call
    # stays one compiled program; the outer jit is still retraced per
    # distinct num_steps, so the warm-up below covers the tail shape too
    emit_chunk = max(kchunk, (emit_chunk // kchunk) * kchunk)
    runk = fc.make_fused_chain(target, cfg, chunk=kchunk, emit="all")

    os.makedirs(out_dir, exist_ok=True)
    colpath = os.path.join(out_dir, f"emit_{tag}.npy")
    cols = np.lib.format.open_memmap(
        colpath, mode="w+", dtype=np.float32, shape=(P, num_steps)
    )
    roots = np.empty((num_steps, 3), np.float32)
    jumps = np.empty(num_steps, np.float64)
    lasts = np.empty((num_steps, 3), np.float32)
    key = jax.random.key(seed)
    theta = theta0
    # compile outside the timed window (results discarded, like the
    # scan cell's warm-up) — both the full-chunk shape and the tail
    # shape, since the outer jit retraces per distinct num_steps
    shapes = {min(emit_chunk, num_steps)}
    if num_steps % emit_chunk:
        shapes.add(num_steps % emit_chunk)
    for n0 in sorted(shapes):
        jax.block_until_ready(runk(jax.random.fold_in(key, 0), theta, n0))
    t0 = time.perf_counter()
    for s in range(0, num_steps, emit_chunk):
        n = min(emit_chunk, num_steps - s)
        out = runk(jax.random.fold_in(key, s), theta, n)
        cols[:, s:s + n] = np.asarray(out["emit_b0"])
        roots[s:s + n] = np.asarray(out["root"])
        jumps[s:s + n] = np.asarray(out["jumps"], np.float64)
        lasts[s:s + n] = np.asarray(out["last"])
        theta = out["root"][-1]
    dt = time.perf_counter() - t0

    # flattened-stream MSJD numerator: within-step sums from the kernel
    # plus every boundary jump last[t] -> root[t+1] (the next step's
    # slot-0 draw IS the next root under all_first); a jump is kept iff
    # its earlier element is post-burn-in, i.e. t >= burn_in — exactly
    # the scan cell's gidx >= burn_in*P rule at step granularity
    d = lasts[:-1].astype(np.float64) - roots[1:].astype(np.float64)
    sq_sum = float(jumps[burn_in:].sum()) + float((d[burn_in:] ** 2).sum())
    return _finish_emit_cell(
        roots, cols, colpath, sq_sum, burn_in, num_steps, dt, keep_emit
    )


def run(
    n_data: int = 10000,
    Ps=(8, 32, 128, 512),
    num_steps: int = 2000,
    burn_in: int = 200,
    algos=("mp", "pmp"),
    seed: int = 0,
    out_dir: str = "results/ess",
    scale: str = "smoke",
    method: str = "auto",
    chains: int = 1,
    trace: str = "root",
    emit_chunk: int = 20000,
    keep_emit: bool = False,
):
    """``chains > 1`` (fused path only): run that many independent
    chains sequentially via ``lax.map`` inside one jit (one TensorCore
    serializes them either way; Mosaic rejects batched SMEM scalar
    blocks under vmap) and report *aggregate* ESS/s and MSJD/s (summed
    across chains) — the multi-chain sampling-throughput figure of
    merit.  The reference's counterpart is hand-pinning independent
    processes to GPUs.

    ``trace`` selects the estimator protocol:

    * ``"root"`` — ESS/MSJD over the chain's root path (one state per
      superstep).  This was the r1/r2 default and is a *divergence*
      from the reference, which dumps every proposal's resampled draw
      each iteration (``ess_per_s_MP.cu:265-278``).
    * ``"all"`` — reference protocol fidelity: all P categorical draws
      are emitted per superstep (``selection="all_first"``); ESS is the
      sum of per-draw-slot stream ESSs (the reference's offline
      analysis treats the P dump streams as chains, ``skewness.ipynb``)
      and MSJD is over the iteration-major flattened emitted stream.
      Root-path numbers are reported alongside from the same run.
      With ``method='fused_chain'`` the cell runs on the production
      megakernel (``emit="all"``: per-slot draws, within-step jump
      sums, and boundary states all computed in-kernel, P <= 512);
      otherwise on the scan path.  The wall clock includes the
      device->host emission the protocol requires (the reference's txt
      dumps sat inside its timed loop too) but excludes compile, like
      the root protocol's untimed warm-up.  Emission is chunked
      (``emit_chunk`` supersteps per device call) and spooled to a disk
      memmap (deleted unless ``keep_emit``).
    """
    Ps = as_tuple(Ps)
    algos = as_tuple(algos)
    if scale == "paper":
        n_data, num_steps, burn_in = 100000, 1_000_000, 2000
    fused_chain = method == "fused_chain"
    if chains > 1 and not fused_chain:
        raise ValueError("chains > 1 requires method='fused_chain'")
    if trace not in ("root", "all"):
        raise ValueError(f"unknown trace mode {trace!r}")
    if trace == "all" and chains > 1:
        raise ValueError("trace='all' supports chains=1 only")
    x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
    target = BayesLinReg(
        x, y, temper=1.0 / 2000.0,
        method="fused" if fused_chain else method,
    )
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)
    out = {}
    rows = []
    for algo in algos:
        for P in Ps:
            if algo == "pmp":
                spec = SamplerSpec(
                    algo="pmp", N=1, depth=tree.binary_depth(P),
                    step_size=0.02, selection="all_first",
                )
            else:
                spec = SamplerSpec(
                    algo="mp", N=P - 1, step_size=0.02,
                    selection="all_first",
                )
            if trace == "all":
                cell = _emit_all_cell_fused if fused_chain else (
                    _emit_all_cell
                )
                root_e, root_m, all_e, all_m, dt = cell(
                    target, spec, theta0, num_steps, burn_in,
                    emit_chunk, out_dir, seed, keep_emit,
                    tag=f"{algo}_P{P}",
                )
                rows.append((algo, P, all_e / dt, all_m / dt, dt))
                out[f"{algo}_P{P}_all_ess_per_s"] = all_e / dt
                out[f"{algo}_P{P}_all_msjd_per_s"] = all_m / dt
                out[f"{algo}_P{P}_ess_per_s"] = root_e / dt
                out[f"{algo}_P{P}_msjd_per_s"] = root_m / dt
                continue
            if fused_chain:
                # whole chain chunks inside one Pallas kernel: the
                # per-superstep op floor disappears, multiplying ESS/s
                # and MSJD/s at identical chain statistics (the trace IS
                # the root path the scan's collect records)
                from pmpx.kernels import fused_chain as fc

                runk = fc.make_fused_chain(
                    target, fc.spec_to_cfg(spec), chunk=1000
                )
                if chains > 1:
                    # sequential lax.map, not vmap: one TensorCore
                    # serializes the chains either way, and Mosaic
                    # rejects batched SMEM scalar blocks under vmap
                    f = jax.jit(
                        lambda k, t, r=runk: (
                            t,
                            jax.lax.map(
                                lambda kk: r(kk, t, num_steps),
                                jax.random.split(k, chains),
                            ),
                        )
                    )
                else:
                    f = jax.jit(
                        lambda k, t, r=runk: (t, r(k, t, num_steps))
                    )
            else:
                superstep = spec.build(target)

                from pmpx.samplers.base import run_chain

                f = jax.jit(
                    lambda k, t, s=superstep: run_chain(
                        s, k, t, num_steps, collect=lambda th, o: th
                    )
                )
            f(jax.random.key(seed), theta0)[1].block_until_ready()
            t0 = time.perf_counter()
            _, roots = f(jax.random.key(seed), theta0)
            roots.block_until_ready()
            dt = time.perf_counter() - t0
            if chains > 1:
                rc = np.asarray(roots)[:, burn_in:]  # (C, steps, 3)
                e = float(sum(
                    float(ess(jnp.asarray(c[:, 0]))) for c in rc
                ))
                m = float(sum(
                    float(msjd(jnp.asarray(c))) * len(c) for c in rc
                )) / dt
                key_sfx = f"_chains{chains}"
            else:
                r = np.asarray(roots)[burn_in:]
                e = float(ess(jnp.asarray(r[:, 0])))
                m = float(msjd(jnp.asarray(r))) * len(r) / dt
                key_sfx = ""
            rows.append((algo, P, e / dt, m, dt))
            out[f"{algo}_P{P}{key_sfx}_ess_per_s"] = e / dt
            out[f"{algo}_P{P}{key_sfx}_msjd_per_s"] = m
    save_trace(
        out_dir,
        "ess_msjd",
        {"rows": np.asarray([(r[2], r[3], r[4]) for r in rows])},
        {"rows": [f"{r[0]}_P{r[1]}" for r in rows], "summary": out},
    )
    try:
        from pmpx.experiments.plots import render_ess_msjd
        import json as _json
        import os as _os

        # merge into any existing summary so the P grid can be filled
        # by separate (resumable) queue stages without clobbering the
        # cells earlier stages recorded
        sp = _os.path.join(out_dir, "summary.json")
        merged = {}
        if _os.path.exists(sp):
            try:
                with open(sp) as f:
                    merged = _json.load(f)
            except Exception:
                merged = {}
        merged.update(out)
        with open(sp, "w") as f:
            _json.dump(merged, f, indent=2)
        render_ess_msjd(sp, out_dir)
    except Exception:
        pass
    return out
