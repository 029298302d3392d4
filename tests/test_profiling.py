"""Profiling helpers work on the CPU backend too."""

import jax
import jax.numpy as jnp

from pmpx import profiling


def test_trace_and_device_time(tmp_path):
    @jax.jit
    def f(x):
        def body(c, _):
            return c @ c * 0.999, None
        out, _ = jax.lax.scan(body, x, None, length=50)
        return out

    x = jnp.eye(64) * 1.001
    jax.block_until_ready(f(x))
    with profiling.trace(str(tmp_path)):
        jax.block_until_ready(f(x))
    ops = profiling.device_time_us(str(tmp_path))
    assert ops, "no device ops recorded"
    assert all(v >= 0 for v in ops.values())


def test_superstep_timer():
    @jax.jit
    def run(x):
        def body(c, _):
            return c * 0.9999, None
        out, _ = jax.lax.scan(body, x, None, length=100)
        return out

    us = profiling.superstep_timer(run, jnp.ones((8, 8)), iters=100)
    assert us > 0
