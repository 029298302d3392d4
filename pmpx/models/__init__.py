"""Model zoo: flax counterparts of the reference's NN posteriors.

| Model      | Reference definition |
|------------|----------------------|
| MnistMLP   | 28^2-512-256-128-10 FC net, ``complex_nets/Mnist/FC/PMP_FC.py:21-36`` |
| MnistCNN   | 2-conv CNN, ``complex_nets/Mnist/CNN/PMP_CNN.py:23-44`` |
| MnistLSTM  | LSTM(28->64) + Linear(10), ``complex_nets/Mnist/LSTM/PMP_LSTM.py:22-43`` |
| LeNet      | CIFAR-10 LeNet w/ BatchNorm, ``complex_nets/Cifar-10/cifar_PMPhmc.py:33-55`` |
| BayesMLP   | torchbnn BayesLinear 784-1024-10 mean-field net, ``Bayesian Network Training/main.py:173-177`` |
"""

from pmpx.models.mlp import MnistMLP
from pmpx.models.cnn import MnistCNN
from pmpx.models.lstm import MnistLSTM
from pmpx.models.lenet import LeNet
from pmpx.models.bnn import BayesMLP
from pmpx.models.packed import PackedLeNet, PackedMnistCNN

__all__ = [
    "MnistMLP",
    "MnistCNN",
    "MnistLSTM",
    "LeNet",
    "BayesMLP",
    "PackedLeNet",
    "PackedMnistCNN",
]
