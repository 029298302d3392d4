"""Load the reference's ACTUAL committed warm-start checkpoints and assert
torch-vs-flax forward equality on real inputs.

The reference seeds every NN sampler from SGD-pretrained pickles:
``FC_model.pkl`` (``PMP_FC.py:188-189``), ``CNN_model.pkl``,
``LSTM_model.pkl``, and ``cifar.pkl`` (``cifar_PMPhmc.py:175-176``).
These tests prove ``theta_from_torch_state`` maps each one onto the
corresponding pmpx posterior bit-for-bit functionally: same logits from
the same bytes, so reference checkpoints can seed pmpx chains directly.

The torch mirror classes below transcribe the reference architectures
(``PMP_FC.py:21-36``, ``PMP_CNN.py:23-44``, ``PMP_LSTM.py:22-43``,
``cifar_PMPhmc.py:33-55``) solely to produce oracle outputs.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pmpx.interop import load_torch_pickle, theta_from_torch_state  # noqa: E402
from pmpx.models import LeNet, MnistCNN, MnistLSTM, MnistMLP  # noqa: E402
from pmpx.targets.nn import NNPosterior  # noqa: E402

REF = "/root/reference/complex_nets"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not mounted"
)


class _FC(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.fc1 = torch.nn.Linear(784, 512)
        self.fc2 = torch.nn.Linear(512, 256)
        self.fc3 = torch.nn.Linear(256, 128)
        self.fc4 = torch.nn.Linear(128, 10)

    def forward(self, x):
        x = x.view(-1, 784)
        for fc in (self.fc1, self.fc2, self.fc3):
            x = torch.relu(fc(x))
        return self.fc4(x)


class _CNN(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(1, 10, 5)
        self.conv2 = torch.nn.Conv2d(10, 20, 3)
        self.fc1 = torch.nn.Linear(2000, 500)
        self.fc2 = torch.nn.Linear(500, 10)

    def forward(self, x):
        x = torch.relu(self.conv1(x))
        x = torch.nn.functional.max_pool2d(x, 2, 2)
        x = torch.relu(self.conv2(x))
        x = x.view(x.size(0), -1)
        return self.fc2(torch.relu(self.fc1(x)))


class _LSTM(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.rnn = torch.nn.LSTM(28, 64, 1, batch_first=True)
        self.out = torch.nn.Linear(64, 10)

    def forward(self, x):
        y, _ = self.rnn(x, None)
        return self.out(y[:, -1, :])


class _LeNet(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.model = torch.nn.Sequential(
            torch.nn.Conv2d(3, 6, 5), torch.nn.BatchNorm2d(6),
            torch.nn.ReLU(), torch.nn.MaxPool2d(2, 2),
            torch.nn.Conv2d(6, 16, 5), torch.nn.BatchNorm2d(16),
            torch.nn.ReLU(), torch.nn.MaxPool2d(2, 2),
            torch.nn.Flatten(),
            torch.nn.Linear(400, 120), torch.nn.ReLU(),
            torch.nn.Linear(120, 84), torch.nn.ReLU(),
            torch.nn.Linear(84, 10),
        )

    def forward(self, x):
        return self.model(x)


CASES = {
    "fc": (f"{REF}/Mnist/FC/FC_model.pkl", _FC, MnistMLP, (8, 28, 28), False),
    "cnn": (
        f"{REF}/Mnist/CNN/CNN_model.pkl", _CNN, MnistCNN, (8, 28, 28), False,
    ),
    "lstm": (
        f"{REF}/Mnist/LSTM/LSTM_model.pkl", _LSTM, MnistLSTM,
        (8, 28, 28), False,
    ),
    "lenet": (
        f"{REF}/Cifar-10/cifar.pkl", _LeNet, LeNet, (8, 32, 32, 3), True,
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_reference_pickle_forward_equality(name):
    path, torch_cls, flax_cls, xshape, nhwc = CASES[name]
    assert os.path.exists(path), path

    rng = np.random.default_rng(0)
    x = rng.normal(size=xshape).astype(np.float32)

    tnet = torch_cls()
    tnet.load_state_dict(
        torch.load(path, map_location="cpu", weights_only=True)
    )
    tnet.train()  # reference never calls eval(): BN uses batch statistics
    if nhwc:
        tx = torch.tensor(np.transpose(x, (0, 3, 1, 2)))
    elif name == "cnn":
        tx = torch.tensor(x[:, None])
    else:
        tx = torch.tensor(x)
    with torch.no_grad():
        want = tnet(tx).numpy()

    post = NNPosterior(
        flax_cls(), jnp.asarray(x), jnp.zeros((xshape[0],), jnp.int32),
        init_key=jax.random.key(0),
    )
    theta = theta_from_torch_state(post, load_torch_pickle(path))
    got = np.asarray(post._logits(theta, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
