"""EX1: repeated-run error boxplots of SP vs MP vs PMP on N(0, 1).

Protocol parity with ``simple_sampling/error/error.py:191-214``: ``times``
repetitions; per repetition run each sampler for ``number_sample``
supersteps and record the post-burn-in mean estimate; the spread of the
mean estimates is the "error".  (The reference runs times=20,
number_sample=10 and plots a boxplot to ``error.pdf``.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pmpx.config import SamplerSpec
from pmpx.experiments._common import collect_samples, maybe_plot
from pmpx.metrics.recorder import save_trace
from pmpx.targets import Gaussian1D


def run(
    times: int = 20,
    number_sample: int = 200,
    N: int = 7,
    deep: int = 2,
    step_size: float = 1.0,
    seed: int = 0,
    out_dir: str = "results/error",
    scale: str = "smoke",
):
    if scale == "paper":
        times, number_sample = 20, 1000
    target = Gaussian1D(mu=0.0, sigma=1.0)
    specs = {
        # SP parity: uniform(-0.25, 0.25) proposal + Barker accept
        # (error.py:27-31)
        "SP": SamplerSpec(
            algo="mh", step_size=0.25, rule="barker", proposal="uniform"
        ),
        "MP": SamplerSpec(algo="mp", N=N, step_size=step_size),
        "PMP": SamplerSpec(
            algo="pmp", N=N, depth=deep, step_size=step_size
        ),
    }
    means = {k: [] for k in specs}
    key = jax.random.key(seed)
    for rep in range(times):
        for name, spec in specs.items():
            key, k_run, k_init = jax.random.split(key, 3)
            theta0 = jax.random.uniform(
                k_init, (1,), jnp.float32, -1.0, 1.0
            )
            superstep = spec.build(target)
            s = collect_samples(superstep, k_run, theta0, number_sample)
            means[name].append(float(s.mean()))
    arrays = {k: np.asarray(v) for k, v in means.items()}
    save_trace(out_dir, "error_boxplot", arrays, {"times": times})

    def plot(plt):
        fig = plt.figure(figsize=(3, 6))
        plt.title("ERROR")
        plt.boxplot(
            [arrays[k] for k in ("SP", "MP", "PMP")],
            tick_labels=["SP", "MP", "PMP"],
        )
        fig.savefig(f"{out_dir}/error.pdf")

    maybe_plot(plot)
    return {
        f"{k}_abs_mean_err": float(np.abs(v).mean())
        for k, v in arrays.items()
    }
