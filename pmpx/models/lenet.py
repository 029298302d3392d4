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

    def with_bn_axis(self, axis):
        return self.clone(bn_axis=axis)

    @nn.compact
    def __call__(self, x):
        # x: (B, 32, 32, 3)
        x = nn.Conv(6, (5, 5), padding="VALID")(x)
        x = nn.BatchNorm(use_running_average=False, use_scale=True,
                         use_bias=True, axis_name=self.bn_axis)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Conv(16, (5, 5), padding="VALID")(x)
        x = nn.BatchNorm(use_running_average=False, use_scale=True,
                         use_bias=True, axis_name=self.bn_axis)(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(120)(x))
        x = nn.relu(nn.Dense(84)(x))
        return nn.Dense(self.num_classes)(x)
