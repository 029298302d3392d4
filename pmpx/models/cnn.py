"""Small MNIST CNN.

Architecture parity with the reference CNN model
(``complex_nets/Mnist/CNN/PMP_CNN.py:20-42``): conv(1->10, 5x5, valid) ->
relu -> maxpool 2 -> conv(10->20, 3x3, valid) -> relu -> FC(2000->500) ->
relu -> FC(10).  (The reference applies log_softmax before CrossEntropyLoss
— a double-log-softmax quirk not reproduced; logits are returned.)
"""

from __future__ import annotations

import flax.linen as nn


class MnistCNN(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        # x: (B, 28, 28) or (B, 28, 28, 1)
        if x.ndim == 3:
            x = x[..., None]
        x = nn.Conv(10, (5, 5), padding="VALID")(x)  # (B, 24, 24, 10)
        x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))  # (B, 12, 12, 10)
        x = nn.Conv(20, (3, 3), padding="VALID")(x)  # (B, 10, 10, 20)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)  # (B, 2000)
        x = nn.relu(nn.Dense(500)(x))
        return nn.Dense(self.num_classes)(x)
