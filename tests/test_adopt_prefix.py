"""Extending a paper run: adopt_prefix_run + resume_chain.

The paper-protocol stems embed num_steps (reference_style_name), so
raising a stage's --num-steps would restart from step 0 without
adoption.  These tests pin (a) the stem-matching rules and (b) that an
adopted extension is bitwise identical to an uninterrupted run of the
larger step count (the fold_in(base_key, step) key schedule makes this
exact, not just statistical).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.checkpoint import (
    TraceAccumulator,
    adopt_prefix_run,
    resume_chain,
    save_checkpoint,
)
from pmpx.metrics.recorder import reference_style_name


def _name_of(steps, model="CNN", N=7):
    return reference_style_name("PMP", 1e-4, steps, model=model, N=N)


def _touch(d, stem, suffixes=(".ckpt", ".loss.npy")):
    for s in suffixes:
        with open(os.path.join(d, stem + s), "w") as f:
            f.write(stem)


def test_adopt_picks_longest_matching_prefix(tmp_path):
    d = str(tmp_path)
    _touch(d, _name_of(5000))
    _touch(d, _name_of(15000))
    # same steps, different protocol — must not match
    _touch(d, _name_of(20000, model="LSTM"))
    _touch(d, _name_of(20000, N=3))
    # larger than the target — must not match
    _touch(d, _name_of(200000))

    got = adopt_prefix_run(d, _name_of, 100000, keys=("loss",))
    assert got == 15000
    # copied, not moved
    for steps in (5000, 15000):
        assert os.path.exists(os.path.join(d, _name_of(steps) + ".ckpt"))
    new = _name_of(100000)
    for s in (".ckpt", ".loss.npy"):
        p = os.path.join(d, new + s)
        assert os.path.exists(p)
        assert open(p).read() == _name_of(15000)

    # idempotent: the new-stem checkpoint now exists, so nothing happens
    assert adopt_prefix_run(d, _name_of, 100000, keys=("loss",)) is None


def test_adopt_nothing_to_adopt(tmp_path):
    assert adopt_prefix_run(str(tmp_path), _name_of, 100) is None
    assert adopt_prefix_run(
        str(tmp_path / "missing"), _name_of, 100
    ) is None


def _superstep(key, theta):
    step = jax.random.normal(key, theta.shape) * 0.1
    theta2 = theta + step
    return theta2, {"loss": jnp.sum(theta2**2)}


def _run(d, steps, chunk, resume_from_adoption=False):
    name = _name_of(steps, model="TOY", N=1)
    ckpt = os.path.join(d, name + ".ckpt")
    if resume_from_adoption:
        adopted = adopt_prefix_run(
            d, lambda s: _name_of(s, model="TOY", N=1), steps,
            keys=("loss",),
        )
        assert adopted is not None
    fresh = not os.path.exists(ckpt)
    acc = TraceAccumulator(d, name, ("loss",), fresh=fresh)
    if fresh:
        save_checkpoint(ckpt, jnp.zeros((3,)), jax.random.key(7), 0)
    resume_chain(
        _superstep, ckpt, steps,
        collect=lambda th, out: out["loss"],
        checkpoint_every=chunk, on_chunk=acc,
    )
    return acc.load("loss")


def test_extension_bitwise_equals_uninterrupted(tmp_path):
    a = str(tmp_path / "extended")
    b = str(tmp_path / "straight")
    os.makedirs(a)
    os.makedirs(b)
    _run(a, 60, 20)
    ext = _run(a, 100, 20, resume_from_adoption=True)
    straight = _run(b, 100, 20)
    assert ext.shape == (100,)
    np.testing.assert_array_equal(ext, straight)
    # the shorter run's own artifacts survive the extension
    short = _name_of(60, model="TOY", N=1)
    assert os.path.exists(os.path.join(a, short + ".ckpt"))
    assert os.path.exists(os.path.join(a, short + ".loss.npy"))


def test_adopt_protocol_sidecar_rules(tmp_path, capsys):
    """The stem pins algo/alpha/model/N; the .protocol.json sidecar pins
    the rest (temper, data knobs, seed, dtype).  A disagreeing sidecar
    is a hard skip; a missing one (pre-sidecar run) adopts with a loud
    warning instead of silently re-running hours of chip time."""
    from pmpx.checkpoint import write_protocol_sidecar

    proto = {"temper": 10.0, "class_sep": 0.35, "seed": 0}

    # disagreeing sidecar: longest prefix is rejected, shorter match wins
    d = str(tmp_path / "a")
    os.makedirs(d)
    _touch(d, _name_of(5000))
    write_protocol_sidecar(d, _name_of(5000), proto)
    _touch(d, _name_of(15000))
    write_protocol_sidecar(d, _name_of(15000), {**proto, "temper": 100.0})
    got = adopt_prefix_run(d, _name_of, 100000, keys=("loss",),
                           protocol=proto)
    assert got == 5000
    # the adopted new stem gets its own sidecar
    import json
    side = os.path.join(d, _name_of(100000) + ".protocol.json")
    assert json.load(open(side)) == proto

    # no sidecar at all: adopt (backward compat) but warn loudly
    d2 = str(tmp_path / "b")
    os.makedirs(d2)
    _touch(d2, _name_of(7000))
    capsys.readouterr()
    got = adopt_prefix_run(d2, _name_of, 100000, keys=("loss",),
                           protocol=proto)
    assert got == 7000
    assert "WARNING" in capsys.readouterr().out

    # all candidates disagree: nothing to adopt
    d3 = str(tmp_path / "c")
    os.makedirs(d3)
    _touch(d3, _name_of(9000))
    write_protocol_sidecar(d3, _name_of(9000), {**proto, "seed": 1})
    assert adopt_prefix_run(d3, _name_of, 100000, keys=("loss",),
                            protocol=proto) is None
