"""Record the chain-farm ESS table on the virtual 8-device CPU mesh.

Runs :func:`pmpx.experiments.multichain.sweep` — 8 chains as one
shard_map'd SPMD program per (algo, P) cell — and writes
``artifacts/multichain/chain_farm.json``.  CPU-only by construction (the
farm pipeline is the multi-chip path; the real chip is one device), so it
never touches the axon TPU grant and is safe to run alongside queue jobs.

Usage: python scripts/run_multichain_farm.py [num_steps]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU plugin and wins over the
# env var; this config update (before any backend init) wins back
jax.config.update("jax_platforms", "cpu")

from pmpx.experiments import multichain  # noqa: E402


def main():
    num_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
    assert len(jax.devices()) == 8, jax.devices()
    multichain.sweep(num_steps=num_steps)


if __name__ == "__main__":
    main()
