"""Packed-layout conv path: equality vs the standard flax modules.

The packed executors (pmpx.models.packed) must be *exactly* the same
function as LeNet/MnistCNN — same params, same logits, same gradients —
only in a different physical layout.  These tests pin that equivalence;
the memory win itself is a TPU layout property measured on hardware
(artifacts/nn_perf), not asserted here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pmpx.kernels import convpack as cp
from pmpx.models import LeNet, MnistCNN, PackedLeNet, PackedMnistCNN
from pmpx.targets.nn import NNPosterior


def test_conv2d_matches_lax_conv():
    k = jax.random.key(0)
    kx, kw, kb = jax.random.split(k, 3)
    B, H, W, C, O, KH, KW = 3, 14, 14, 6, 16, 5, 5
    x = jax.random.normal(kx, (B, H, W, C))
    kern = jax.random.normal(kw, (KH, KW, C, O)) * 0.1
    bias = jax.random.normal(kb, (O,))
    ref = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + bias
    packed, g = cp.pack_images(x)
    out, go = cp.conv2d(packed, kern, bias, g)
    assert (go.h, go.w, go.wr) == (H - KH + 1, W - KW + 1, W)
    np.testing.assert_allclose(
        cp.unpack(out, go), ref, rtol=1e-5, atol=1e-5
    )


def test_conv2d_ignores_junk_columns():
    """Valid outputs must not depend on junk-column values (wr > w)."""
    k = jax.random.key(1)
    B, C, O = 2, 4, 8
    g = cp.Grid(h=12, wr=16, w=12)  # 4 junk columns per row
    x = jax.random.normal(k, (B, C, g.size))
    kern = jax.random.normal(jax.random.key(2), (3, 3, C, O)) * 0.1
    bias = jnp.zeros((O,))
    out1, go = cp.conv2d(x, kern, bias, g)
    # poison the junk columns; valid outputs must be unchanged
    poison = x + 1e6 * (1.0 - cp.valid_mask(g, x.dtype))
    out2, _ = cp.conv2d(poison, kern, bias, g)
    m = cp.valid_mask(go, x.dtype)
    np.testing.assert_allclose(out1 * m, out2 * m, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize(
    "flax_cls,packed_cls,shape",
    [
        (LeNet, PackedLeNet, (4, 32, 32, 3)),
        (MnistCNN, PackedMnistCNN, (4, 28, 28)),
    ],
)
def test_packed_forward_equals_flax(flax_cls, packed_cls, shape):
    x = jax.random.normal(jax.random.key(3), shape)
    flax_model = flax_cls()
    variables = flax_model.init({"params": jax.random.key(4)}, x)
    aux = [k for k in variables if k != "params"]
    if aux:
        ref, _ = flax_model.apply(variables, x, mutable=aux)
        out, _ = packed_cls().apply(variables, x, mutable=aux)
    else:
        ref = flax_model.apply(variables, x)
        out = packed_cls().apply(variables, x)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("remat", [True, False])
def test_packed_grads_equal_flax(remat):
    """value_and_grad_batch through NNPosterior: packed == standard."""
    x = jax.random.normal(jax.random.key(5), (6, 32, 32, 3))
    y = jax.random.randint(jax.random.key(6), (6,), 0, 10)
    t_std = NNPosterior(LeNet(), x, y, init_key=jax.random.key(7))
    t_pck = NNPosterior(
        PackedLeNet(remat=remat), x, y, init_key=jax.random.key(7)
    )
    # identical init (shim delegates to LeNet.init)
    np.testing.assert_array_equal(t_std.init_theta(), t_pck.init_theta())
    Theta = t_std.init_theta()[None, :] * jnp.array([1.0, 0.9])[:, None]
    v1, g1 = jax.jit(t_std.value_and_grad_batch)(Theta)
    v2, g2 = jax.jit(t_pck.value_and_grad_batch)(Theta)
    np.testing.assert_allclose(v1, v2, rtol=1e-5)
    np.testing.assert_allclose(g1, g2, rtol=5e-3, atol=1e-6)


def test_packed_theta_interop_with_torch_checkpoint(tmp_path):
    """theta_from_torch_state lands identically on packed and standard
    targets (same param pytree), so reference warm starts work packed."""
    torch = pytest.importorskip("torch")
    from pmpx.interop import theta_from_torch_state

    class TorchLeNet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.c1 = torch.nn.Conv2d(3, 6, 5)
            self.b1 = torch.nn.BatchNorm2d(6)
            self.c2 = torch.nn.Conv2d(6, 16, 5)
            self.b2 = torch.nn.BatchNorm2d(16)
            self.f1 = torch.nn.Linear(400, 120)
            self.f2 = torch.nn.Linear(120, 84)
            self.f3 = torch.nn.Linear(84, 10)

    sd = {
        k: v.detach().numpy()
        for k, v in TorchLeNet().state_dict().items()
    }
    x = jax.random.normal(jax.random.key(8), (4, 32, 32, 3))
    y = jnp.zeros((4,), jnp.int32)
    t_std = NNPosterior(LeNet(), x, y, init_key=jax.random.key(9))
    t_pck = NNPosterior(PackedLeNet(), x, y, init_key=jax.random.key(9))
    th1 = theta_from_torch_state(t_std, sd)
    th2 = theta_from_torch_state(t_pck, sd)
    np.testing.assert_array_equal(th1, th2)
    np.testing.assert_allclose(
        t_pck.log_prob(th2), t_std.log_prob(th1), rtol=1e-5
    )
