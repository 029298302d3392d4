"""Mean-field Bayesian MLP (torchbnn-style BayesLinear layers).

Parity with the reference BNN (``Bayesian Network Training/main.py:173-177``:
torchbnn ``BayesLinear(prior_mu=0, prior_sigma=0.1, 784, 1024)`` + ReLU +
``BayesLinear(1024, 10)``, ~1.6M parameters).  Each layer's parameters are
(weight_mu, weight_log_sigma, bias_mu, bias_log_sigma); every forward pass
draws fresh weights ``W = mu + exp(log_sigma) * eps`` via the ``"sample"``
RNG stream — the MCMC chain state is the (mu, log_sigma) vector, exactly as
in the reference where the optimizer perturbs the distribution parameters.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class BayesLinear(nn.Module):
    features: int
    prior_sigma: float = 0.1

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        init_ls = math.log(self.prior_sigma)
        w_mu = self.param(
            "w_mu",
            nn.initializers.kaiming_uniform(),
            (in_f, self.features),
        )
        w_ls = self.param(
            "w_log_sigma",
            nn.initializers.constant(init_ls),
            (in_f, self.features),
        )
        b_mu = self.param(
            "b_mu", nn.initializers.zeros, (self.features,)
        )
        b_ls = self.param(
            "b_log_sigma",
            nn.initializers.constant(init_ls),
            (self.features,),
        )
        kw = self.make_rng("sample")
        kb = self.make_rng("sample")
        import jax

        W = w_mu + jnp.exp(w_ls) * jax.random.normal(kw, w_mu.shape)
        b = b_mu + jnp.exp(b_ls) * jax.random.normal(kb, b_mu.shape)
        return x @ W + b


class BayesMLP(nn.Module):
    hidden: int = 1024
    num_classes: int = 10
    prior_sigma: float = 0.1

    @nn.compact
    def __call__(self, x):
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(BayesLinear(self.hidden, self.prior_sigma)(x))
        return BayesLinear(self.num_classes, self.prior_sigma)(x)
