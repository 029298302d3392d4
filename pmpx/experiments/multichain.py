"""Multi-chain convergence diagnostics: R-hat, per-chain ESS, pooled moments.

Beyond the reference (which runs independent chains only as hand-pinned
processes with no cross-chain diagnostics, SURVEY.md §2.5): C chains run as
one vmapped (single device) or shard_map'd (``chains`` mesh axis) batch,
and split-R-hat / per-chain ESS quantify convergence — the modern
diagnostics the reference's visual validation lacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.config import SamplerSpec
from pmpx.metrics import ess, ess_chunked, split_rhat
from pmpx.metrics.recorder import save_trace
from pmpx.parallel import make_mesh, run_chains_sharded, run_chains_vmapped
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg


def run(
    n_data: int = 4096,
    n_chains: int = 8,
    num_steps: int = 800,
    algo: str = "pmp",
    N: int = 1,
    depth: int = 3,
    step_size: float = 0.05,
    sharded: bool = False,
    seed: int = 0,
    out_dir: str = "results/multichain",
    scale: str = "smoke",
    method: str = "auto",
    mode: str = "single",
    ps: str = "8,16,32,64,128,256,512",
    algos: str = "mp,pmp",
    path: str = "sharded",
    chunk: int = 500,
    out_name: str = "",
):
    if mode == "sweep":
        # chain-farm ESS/R-hat table (``--mode sweep``); comma-separated
        # --ps / --algos, e.g. the paper-grade 1M-step fused farm:
        #   multichain --mode sweep --path fused --num-steps 1000000
        # the CLI pre-parses "8,16" into a tuple; accept both forms
        if isinstance(ps, str):
            ps = tuple(int(p) for p in ps.split(",") if p)
        elif isinstance(ps, int):
            ps = (ps,)
        if isinstance(algos, str):
            algos = tuple(a for a in algos.split(",") if a)
        return sweep(
            Ps=tuple(ps), algos=tuple(algos),
            n_chains=n_chains, num_steps=num_steps, n_data=n_data,
            step_size=step_size, seed=seed, out_dir=out_dir, path=path,
            chunk=chunk, out_name=out_name or None,
        )
    if scale == "paper":
        n_data, num_steps = 100000, 5000
    x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
    target = BayesLinReg(x, y, temper=50.0 / n_data, method=method)
    spec = SamplerSpec(
        algo=algo, N=N, depth=depth, step_size=step_size,
        selection="all_first",
    )
    superstep = spec.build(target)
    keys = jax.random.split(jax.random.key(seed + 1), n_chains)
    # overdispersed initializations in EVERY coordinate (sigma included),
    # as R-hat methodology requires
    rng = np.random.default_rng(seed)
    inits = rng.uniform(-3, 3, size=(n_chains, 2))
    sigmas = rng.uniform(0.3, 2.0, size=(n_chains, 1))
    theta0 = jnp.asarray(
        np.concatenate([inits, sigmas], axis=1), jnp.float32
    )
    collect = lambda th, o: th
    if sharded:
        mesh = make_mesh(chains=n_chains)
        _, roots = jax.jit(
            lambda k, t: run_chains_sharded(
                superstep, k, t, num_steps, mesh, collect=collect
            )
        )(keys, theta0)
    else:
        _, roots = jax.jit(
            lambda k, t: run_chains_vmapped(
                superstep, k, t, num_steps, collect=collect
            )
        )(keys, theta0)
    roots = np.asarray(roots)  # (chains, steps, 3)
    half = num_steps // 2
    tail = roots[:, half:, :]

    out = {}
    for j, name in enumerate(("beta0", "beta1", "sigma")):
        vals = np.abs(tail[:, :, j]) if name == "sigma" else tail[:, :, j]
        out[f"rhat_{name}"] = float(split_rhat(jnp.asarray(vals)))
        out[f"ess_{name}"] = float(
            np.mean([float(ess(jnp.asarray(v))) for v in vals])
        )
        out[f"mean_{name}"] = float(vals.mean())
    save_trace(out_dir, "multichain", {"roots": roots}, out)
    return out


def sweep(
    Ps=(8, 16, 32, 64, 128, 256, 512),
    algos=("mp", "pmp"),
    n_chains: int = 8,
    num_steps: int = 5000,
    n_data: int = 100000,
    step_size: float = 0.05,
    seed: int = 0,
    out_dir: str = "artifacts/multichain",
    path: str = "sharded",
    chunk: int = 500,
    out_name: str | None = None,
):
    """Chain-farm ESS table: aggregate ESS/s + split-R-hat per P.

    ``n_chains`` chains run as ONE SPMD program via
    :func:`run_chains_sharded` over the mesh ``chains`` axis (the tested
    pipeline of ``tests/test_parallel.py``, now recorded as an artifact).
    For each (algo, P) cell: P proposals per superstep — flat MTM for
    ``mp`` (reference ``ess_per_s_MP.cu``), a binary depth-log2(P) tree
    for ``pmp`` (``ess_per_s_PMP.cu``) — wall time is the post-compile
    jitted farm call, aggregate ESS/s sums the per-chain tail ESS of every
    coordinate stream across chains, and split-R-hat certifies the farm
    actually converged (a diagnostic the reference's hand-pinned
    multi-process protocol has no analog of; SURVEY.md §2.5).

    ``path="fused"`` farms the production megakernel instead
    (:func:`pmpx.parallel.run_chains_fused`; sufficient-statistics
    likelihood, whole ``chunk`` of supersteps per ``pallas_call``) —
    wall-clock is only meaningful on real TPU chips; on CPU the kernel
    runs interpreted (and the mesh is capped at 4 shards: more concurrent
    interpret-mode callback shards deadlock the host callback pool).
    """
    import time

    x, y = make_synthetic_linreg(jax.random.key(seed), n_data)
    target = BayesLinReg(x, y, temper=50.0 / n_data)
    rng = np.random.default_rng(seed)
    theta0 = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-3, 3, size=(n_chains, 2)),
                rng.uniform(0.3, 2.0, size=(n_chains, 1)),
            ],
            axis=1,
        ),
        jnp.float32,
    )
    # shard count must (a) not exceed the devices present (a single real
    # TPU chip farms all chains locally via lax.map — the megakernel owns
    # the chip per step anyway), (b) stay <=4 for interpret-mode fused on
    # CPU (more concurrent callback shards deadlock the host pool), and
    # (c) divide n_chains, or shard_map rejects the (C,) inputs with an
    # opaque sharding error (ADVICE r4).
    limit = len(jax.devices())
    if path == "fused" and jax.default_backend() != "tpu":
        limit = min(limit, 4)
    cap = max(s for s in range(1, min(n_chains, limit) + 1)
              if n_chains % s == 0)
    mesh = make_mesh(chains=cap)
    collect = lambda th, o: th
    rows = []
    for algo in algos:
        for P in Ps:
            if algo == "pmp":
                depth = int(np.log2(P))
                assert (1 << depth) == P, "binary PMP needs P a power of 2"
                spec = SamplerSpec(
                    algo="pmp", N=1, depth=depth, step_size=step_size,
                    selection="all_first",
                )
            else:
                spec = SamplerSpec(
                    algo="mp", N=P, depth=1, step_size=step_size,
                    selection="all_first",
                )
            if path == "fused":
                from pmpx.kernels import fused_chain as fc
                from pmpx.parallel import make_chain_farm_fused

                # built ONCE per cell so the warm-up call below hits the
                # same compiled executable as the timed call (ADVICE r4:
                # a per-call run_chains_fused re-traced the kernel and
                # the timed call paid the re-compile)
                farm = make_chain_farm_fused(
                    target, fc.spec_to_cfg(spec), num_steps, mesh,
                    chunk=min(chunk, num_steps),
                )
            else:
                superstep = spec.build(target)
                farm = jax.jit(
                    lambda k, t, s=superstep: run_chains_sharded(
                        s, k, t, num_steps, mesh, collect=collect
                    )
                )
            keys = jax.random.split(jax.random.key(seed + 1), n_chains)
            jax.block_until_ready(farm(keys, theta0))  # compile + warm
            keys2 = jax.random.split(jax.random.key(seed + 2), n_chains)
            t0 = time.perf_counter()
            out = jax.block_until_ready(farm(keys2, theta0))
            wall = time.perf_counter() - t0
            roots = out if path == "fused" else out[1]
            roots = np.asarray(roots)  # (chains, steps, 3)
            tail = roots[:, num_steps // 2 :, :]
            row = {
                "algo": algo,
                "P": int(P),
                "chains": int(n_chains),
                "steps": int(num_steps),
                "wall_s": float(wall),
            }
            # long streams (the 1M-step paper farm): host-side chunked
            # Geyer estimator — same result, O(block) memory, and no
            # device FFT dispatches against the mid-stage TPU backend
            long_stream = tail.shape[1] >= (1 << 18)
            total_ess = 0.0
            for j, name in enumerate(("beta0", "beta1", "sigma")):
                vals = np.abs(tail[:, :, j]) if j == 2 else tail[:, :, j]
                row[f"rhat_{name}"] = float(split_rhat(jnp.asarray(vals)))
                if long_stream:
                    ch_ess = [ess_chunked(v) for v in vals]
                else:
                    ch_ess = [float(ess(jnp.asarray(v))) for v in vals]
                total_ess += sum(ch_ess)
                row[f"ess_{name}"] = float(np.sum(ch_ess))
            row["agg_ess_per_s"] = total_ess / wall
            rows.append(row)
            print(
                f"[multichain.sweep] {algo} P={P}: "
                f"agg_ess_per_s={row['agg_ess_per_s']:.1f} "
                f"rhat_beta1={row['rhat_beta1']:.4f} wall={wall:.2f}s",
                flush=True,
            )
    import json as _json
    import os as _os

    _os.makedirs(out_dir, exist_ok=True)
    summary = {
        "protocol": (
            f"{n_chains} chains sharded over a "
            f"{mesh.devices.size}-device mesh "
            "(one shard_map'd SPMD program), synthetic linreg "
            f"n={n_data}, {num_steps} supersteps, tail-half metrics"
        ),
        "path": path,
        "rows": rows,
    }
    name = out_name or (
        "chain_farm_fused.json" if path == "fused" else "chain_farm.json"
    )
    with open(_os.path.join(out_dir, name), "w") as f:
        _json.dump(summary, f, indent=1)
    return summary
