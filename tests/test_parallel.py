"""Sharding tests on the virtual 8-device CPU mesh (the fake multi-chip
backend the reference lacks; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pmpx import PMPConfig
from pmpx.parallel import (
    AXIS_DATA,
    ShardedLinReg,
    make_mesh,
    run_chains_data_sharded,
    run_chains_sharded,
    run_chains_vmapped,
)
from pmpx.samplers import pmp
from pmpx.targets import Gaussian1D
from pmpx.targets.linreg import BayesLinReg, make_synthetic_linreg

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_sharded_chains_match_vmapped():
    """8 chains over the chains axis == the same 8 chains vmapped locally."""
    target = Gaussian1D()
    cfg = PMPConfig(N=3, depth=2, step_size=1.0)
    superstep = pmp.make_superstep(target, cfg)
    keys = jax.random.split(jax.random.key(0), 8)
    theta0 = jnp.zeros((8, 1), jnp.float32)

    mesh = make_mesh(chains=8)
    _, rec_sh = run_chains_sharded(superstep, keys, theta0, 200, mesh)
    _, rec_vm = run_chains_vmapped(superstep, keys, theta0, 200)
    np.testing.assert_allclose(
        np.asarray(rec_sh["samples"]),
        np.asarray(rec_vm["samples"]),
        rtol=1e-6,
        atol=1e-6,
    )


def test_data_sharded_loglik_matches_global():
    """ShardedLinReg psum over 4 data shards == unsharded evaluation."""
    x, y = make_synthetic_linreg(jax.random.key(1), 4096)
    full = BayesLinReg(x, y, method="xla")
    Theta = jax.random.normal(jax.random.key(2), (16, 3)) * 0.3 + jnp.array(
        [0.0, 0.0, 1.0]
    )
    want = np.asarray(full.log_prob_batch(Theta))

    mesh = make_mesh(chains=1, data=4)

    @jax.jit
    def sharded_eval(x, y, Theta):
        from jax import shard_map

        def body(x_l, y_l, Th):
            t = ShardedLinReg(x_l, y_l, n_total=4096, method="xla")
            return t.log_prob_batch(Th)

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(AXIS_DATA), P(AXIS_DATA), P()),
            out_specs=P(),
            check_vma=False,
        )(x, y, Theta)

    got = np.asarray(sharded_eval(x, y, Theta))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-3)


def test_tree_sharded_matches_unsharded():
    """Tree-axis sharded superstep == unsharded superstep, same keys."""
    from jax import shard_map

    from pmpx.parallel import AXIS_TREE, make_tree_sharded_superstep

    x, y = make_synthetic_linreg(jax.random.key(5), 2048)
    target = BayesLinReg(x, y, temper=50.0 / 2048, method="xla")
    cfg = PMPConfig(N=1, depth=4, step_size=0.05, selection="all_first")

    sup_plain = pmp.make_superstep(target, cfg)
    sup_tree = make_tree_sharded_superstep(target, cfg)
    mesh = make_mesh(chains=1, data=1, tree=4)

    key = jax.random.key(6)
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32)

    @jax.jit
    def sharded(key, theta):
        def body(k, t):
            th2, out = sup_tree(k, t)
            return th2, out["log_accept"]

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )(key, theta)

    th_s, logA_s = sharded(key, theta0)
    th_p, out_p = jax.jit(sup_plain)(key, theta0)
    np.testing.assert_allclose(
        np.asarray(logA_s), np.asarray(out_p["log_accept"]),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(th_s), np.asarray(th_p), rtol=1e-5, atol=1e-5
    )


def test_chain_farm_ess_rhat_pipeline():
    """The multi-chip chain farm driven through a real protocol: 8
    sharded chains (one per mesh device), hundreds of steps, aggregate
    ESS + split-R-hat + posterior-mean statistical asserts — the loop
    closure between the dryrun's 1-step smoke and the multichain
    headline claim (VERDICT r2)."""
    from pmpx.metrics import ess, split_rhat

    x, y = make_synthetic_linreg(jax.random.key(3), 4096)
    target = BayesLinReg(x, y, method="xla")
    cfg = PMPConfig(N=3, depth=2, step_size=0.02, selection="all_first")
    superstep = pmp.make_superstep(target, cfg)

    C, steps, burn = 8, 800, 300
    keys = jax.random.split(jax.random.key(7), C)
    # overdispersed init so R-hat actually tests between-chain agreement
    theta0 = jnp.array([0.0, 0.0, 1.0], jnp.float32) + 0.2 * (
        jax.random.normal(jax.random.key(8), (C, 3))
    )
    theta0 = theta0.at[:, 2].set(jnp.abs(theta0[:, 2]) + 0.5)

    mesh = make_mesh(chains=8)
    _, roots = run_chains_sharded(
        superstep, keys, theta0, steps, mesh,
        collect=lambda th, o: th,
    )
    post = np.asarray(roots)[:, burn:, :]  # (C, steps-burn, 3)

    # chains converge to the same posterior: split-R-hat near 1
    for d in range(3):
        r = float(split_rhat(jnp.asarray(post[:, :, d])))
        assert r < 1.25, f"coord {d}: R-hat {r}"
    # the farm's figure of merit: aggregate ESS across the 8 chains
    agg_ess = sum(float(ess(jnp.asarray(post[c, :, 0]))) for c in range(C))
    assert agg_ess > 8.0, f"aggregate ESS {agg_ess}"
    # and the pooled posterior recovers the generative parameters
    pooled = post.reshape(-1, 3)
    assert abs(pooled[:, 0].mean() + 1.0) < 0.15
    assert abs(pooled[:, 1].mean() - 2.0) < 0.15
    assert abs(pooled[:, 2].mean() - 0.5) < 0.15


def test_data_sharded_chain_recovers_parameters():
    """Full pipeline: 2 chains x 4 data shards, posterior hits truth."""
    x, y = make_synthetic_linreg(jax.random.key(3), 4096)
    mesh = make_mesh(chains=2, data=4)
    cfg = PMPConfig(N=3, depth=2, step_size=0.02)

    def make_local(x_l, y_l):
        t = ShardedLinReg(x_l, y_l, n_total=4096, method="xla")
        return pmp.make_superstep(t, cfg)

    keys = jax.random.split(jax.random.key(4), 2)
    theta0 = jnp.tile(jnp.array([0.0, 0.0, 1.0], jnp.float32), (2, 1))
    _, recs = run_chains_data_sharded(
        make_local, x, y, keys, theta0, 800, mesh
    )
    s = np.asarray(recs["samples"]).reshape(-1, 3)
    tail = s[len(s) // 2 :]
    assert abs(tail[:, 0].mean() + 1.0) < 0.15
    assert abs(tail[:, 1].mean() - 2.0) < 0.15


def test_multichain_sweep_writes_chain_farm_table(tmp_path):
    """The recorded chain-farm artifact pipeline (multichain.sweep): one
    (algo, P) cell end-to-end on the 8-device mesh, table row carries
    aggregate ESS/s + split-R-hat per coordinate."""
    from pmpx.experiments import multichain

    out = multichain.sweep(
        Ps=(4,), algos=("pmp",), num_steps=120, n_data=2048,
        out_dir=str(tmp_path),
    )
    (row,) = out["rows"]
    assert row["algo"] == "pmp" and row["P"] == 4
    assert row["agg_ess_per_s"] > 0
    for c in ("beta0", "beta1", "sigma"):
        assert np.isfinite(row[f"rhat_{c}"])
    assert (tmp_path / "chain_farm.json").exists()


def test_multichain_sweep_fused_path(tmp_path):
    """sweep(path="fused") farms the production megakernel: same table
    schema, chain_farm_fused.json artifact, mesh auto-capped at 4 shards
    on CPU (interpret-mode callback-pool limit)."""
    from pmpx.experiments import multichain

    out = multichain.sweep(
        Ps=(4,), algos=("pmp",), num_steps=96, n_data=2048,
        out_dir=str(tmp_path), path="fused", chunk=32,
    )
    assert out["path"] == "fused"
    (row,) = out["rows"]
    assert row["algo"] == "pmp" and row["P"] == 4
    assert row["agg_ess_per_s"] > 0
    for c in ("beta0", "beta1", "sigma"):
        assert np.isfinite(row[f"rhat_{c}"])
    assert (tmp_path / "chain_farm_fused.json").exists()


def test_fused_chain_farm_matches_serial():
    """8 megakernel chains farmed over the chains mesh axis are bit-identical
    to the same 8 chains run serially through make_fused_chain's run —
    the production-path analog of the reference's one-process-per-GPU
    protocol (ess_per_s_MP.cu:89)."""
    from pmpx.kernels.fused_chain import make_fused_chain
    from pmpx.parallel import run_chains_fused

    x, y = make_synthetic_linreg(jax.random.key(7), 2048)
    target = BayesLinReg(x, y, temper=50.0 / 2048)
    cfg = PMPConfig(N=1, depth=3, step_size=0.05, selection="all_first")
    num_steps, chunk = 48, 16

    keys = jax.random.split(jax.random.key(8), 8)
    rng = np.random.default_rng(0)
    theta0 = jnp.asarray(
        np.concatenate(
            [rng.uniform(-2, 2, (8, 2)), rng.uniform(0.5, 1.5, (8, 1))],
            axis=1,
        ),
        jnp.float32,
    )

    # 4 shards x 2 local chains: exercises both the shard_map split and the
    # per-device lax.map.  NOT 8 shards: interpret-mode Pallas runs as host
    # callbacks, and 8 concurrent callback-bearing shards exhaust the CPU
    # callback thread pool and deadlock (TPU executes the kernel natively,
    # no callbacks — unaffected).
    mesh = make_mesh(chains=4)
    farm = run_chains_fused(
        target, cfg, keys, theta0, num_steps, mesh, chunk=chunk
    )
    assert farm.shape == (8, num_steps, 3)

    runk = make_fused_chain(target, cfg, chunk=chunk)
    for c in range(8):
        serial = runk(keys[c], theta0[c], num_steps)
        np.testing.assert_array_equal(
            np.asarray(farm[c]), np.asarray(serial)
        )
