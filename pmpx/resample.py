"""On-device categorical resampling.

Replaces the reference's host-side resamplers (pandas weighted ``sample``
``error.py:66-76``, ``torch.multinomial`` + ``.cpu().item()`` sync
``PMP_FC.py:141-143``, ``std::discrete_distribution`` after a D2H copy
``conv_mp.cu:253-259``) with pure on-device draws.

For the "draw P indices from P categories" pattern, ``jax.random.categorical``
generates a (num, P) Gumbel field — P*num threefry values.  The inverse-CDF
form below needs only ``num`` uniforms plus a (num, P) comparison-sum, which
is substantially cheaper for large P and distributionally identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["categorical", "categorical_many"]


def categorical(key: jnp.ndarray, logits: jnp.ndarray) -> jnp.ndarray:
    """One draw from unnormalized logits (Gumbel-max; cheap at num=1)."""
    return jax.random.categorical(key, logits)


def categorical_many(
    key: jnp.ndarray, logits: jnp.ndarray, num: int
) -> jnp.ndarray:
    """``num`` iid draws from unnormalized ``logits`` via inverse CDF.

    idx_i = #{j : cdf_j < u_i} with cdf the normalized cumulative sum of
    softmax(logits); exact (ties occur with probability zero for continuous
    uniforms against strictly increasing cdf entries).
    """
    p = jax.nn.softmax(logits)
    cdf = jnp.cumsum(p)
    cdf = cdf / cdf[-1]  # exact normalization against fp drift
    u = jax.random.uniform(key, (num,), logits.dtype)
    # (num, P) comparison; sum along P gives the inverted index
    idx = jnp.sum(u[:, None] > cdf[None, :], axis=1)
    return jnp.clip(idx, 0, logits.shape[0] - 1).astype(jnp.int32)
