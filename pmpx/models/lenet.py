"""LeNet for CIFAR-10 with BatchNorm.

Architecture parity with the reference
(``complex_nets/Cifar-10/cifar_PMPhmc.py:33-55``): conv(3->6, 5x5) -> BN ->
relu -> maxpool -> conv(6->16, 5x5) -> BN -> relu -> maxpool -> FC(400->120)
-> relu -> FC(84) -> relu -> FC(10).  BatchNorm runs in batch-statistics
mode (the reference always trains full-batch, so train-mode statistics are
deterministic given the batch; running averages are irrelevant to the
posterior and are not kept as state).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn


class LeNet(nn.Module):
    num_classes: int = 10
    # sync-BN mesh axis for data-parallel full-batch evaluation (global
    # batch statistics; see pmpx.parallel.sharded_nn)
    bn_axis: Optional[str] = None
    # rematerialize each conv block in the backward pass (residuals shrink
    # to post-pool block boundaries).  Measured on v5e: the compiled peak
    # of the full-batch P=8 grad program is IDENTICAL with and without it
    # (25.73 GiB both ways; artifacts/nn_perf) — XLA:TPU's scheduler
    # already rematerializes this program, so the flag is kept for other
    # backends/shapes, not as a TPU memory lever (bf16 compute is the
    # lever that works: 25.7 -> 14.8 GiB).  Param tree is unchanged
    # (function-lifted remat), so thetas/checkpoints interop with the
    # plain model bit-for-bit.
    remat: bool = False

    def with_bn_axis(self, axis):
        return self.clone(bn_axis=axis)

    def _block1(self, x):
        x = nn.Conv(6, (5, 5), padding="VALID")(x)
        x = nn.BatchNorm(use_running_average=False, use_scale=True,
                         use_bias=True, axis_name=self.bn_axis)(x)
        x = nn.relu(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    def _block2(self, x):
        x = nn.Conv(16, (5, 5), padding="VALID")(x)
        x = nn.BatchNorm(use_running_average=False, use_scale=True,
                         use_bias=True, axis_name=self.bn_axis)(x)
        x = nn.relu(x)
        return nn.max_pool(x, (2, 2), strides=(2, 2))

    @nn.compact
    def __call__(self, x):
        # x: (B, 32, 32, 3)
        if self.remat:
            x = nn.remat(LeNet._block1)(self, x)
            x = nn.remat(LeNet._block2)(self, x)
        else:
            x = self._block1(x)
            x = self._block2(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(120)(x))
        x = nn.relu(nn.Dense(84)(x))
        return nn.Dense(self.num_classes)(x)
