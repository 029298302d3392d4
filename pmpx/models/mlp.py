"""4-layer MLP over flattened MNIST digits.

Architecture parity with the reference FC model
(``complex_nets/Mnist/FC/PMP_FC.py:21-36``): 784-512-256-128-10, ReLU.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class MnistMLP(nn.Module):
    widths: tuple = (512, 256, 128)
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        for w in self.widths:
            x = nn.relu(nn.Dense(w)(x))
        return nn.Dense(self.num_classes)(x)
