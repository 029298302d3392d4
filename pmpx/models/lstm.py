"""Row-sequence LSTM over MNIST digits.

Architecture parity with the reference LSTM model
(``complex_nets/Mnist/LSTM/PMP_LSTM.py:22-43``): each 28x28 digit is a
28-step sequence of 28-pixel rows through an LSTM with 64 hidden units;
the final time step feeds a Dense(10) head.
"""

from __future__ import annotations

import flax.linen as nn


class MnistLSTM(nn.Module):
    hidden: int = 64
    num_classes: int = 10

    @nn.compact
    def __call__(self, x):
        # x: (B, 28, 28) = (batch, time, features)
        x = x.reshape(x.shape[0], 28, 28)
        y = nn.RNN(nn.OptimizedLSTMCell(self.hidden))(x)  # (B, 28, hidden)
        return nn.Dense(self.num_classes)(y[:, -1, :])
