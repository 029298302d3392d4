"""Drive the full NN-posterior zoo on the real TPU.

MNIST: {FC, CNN, LSTM} x {MH, MP, PMP} (reference
``complex_nets/Mnist/*/{MH,MP,PMP}_*.py`` — 9 scripts, 9 cells here) and
CIFAR: LeNet x {SP, MP, PMP}-HMC (``cifar_{SP,MP,PMP}hmc.py``).
Data difficulty (class_sep) is set so accuracy curves separate *below*
ceiling, making the sampler comparison meaningful.

Usage: python scripts/run_zoo.py [out_root]
"""

import json
import sys
import time

sys.path.insert(0, ".")


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "artifacts"
    from pmpx.experiments import cifar_hmc, mnist

    rows = []
    for model in ("FC", "CNN", "LSTM"):
        for algo in ("mh", "mp", "pmp"):
            t0 = time.time()
            # weak warm start (like the reference's half-trained pkls) +
            # hard class separation: the SAMPLER does the optimization,
            # so per-iteration convergence discriminates MH/MP/PMP
            out = mnist.run(
                model=model,
                algo=algo,
                num_steps=2000,
                n_train=4096,
                n_test=1024,
                pretrain_steps=15,
                class_sep=0.35,
                out_dir=f"{out_root}/mnist_zoo",
            )
            out.update(model=model, algo=algo, wall_s=time.time() - t0)
            rows.append(out)
            print(json.dumps(out), flush=True)
    with open(f"{out_root}/mnist_zoo/summary.json", "w") as f:
        json.dump(rows, f, indent=1)

    import os
    if os.environ.get("PMPX_ZOO_SKIP_CIFAR") == "1":
        return
    rows = []
    for algo in ("sp_hmc", "mp_hmc", "pmp_hmc"):
        t0 = time.time()
        out = cifar_hmc.run(
            algo=algo,
            num_steps=60,
            n_train=2048,
            n_test=512,
            pretrain_steps=30,
            class_sep=0.45,
            out_dir=f"{out_root}/cifar_zoo",
        )
        out.update(algo=algo, wall_s=time.time() - t0)
        rows.append(out)
        print(json.dumps(out), flush=True)
    with open(f"{out_root}/cifar_zoo/summary.json", "w") as f:
        json.dump({"note": (
            "smoke-scale zoo run (tens of supersteps from a warm start) "
            "— a cheap regression cell only; do NOT read sampler "
            "orderings from it.  Paper-scale results: "
            "artifacts/cifar_paper/ (50,000-superstep protocol)."
        ), "cells": rows}, f, indent=1)


if __name__ == "__main__":
    main()
