"""pmpx command-line interface.

One entrypoint replaces the reference's 30 hand-edited scripts and its lone
argparse CLI (``Bayesian Network Training/main.py:15-22``):

    python -m pmpx.cli list
    python -m pmpx.cli run error_boxplot --times 5
    python -m pmpx.cli run bnn --n 3 --scale paper
    python -m pmpx.cli run time_analysis --iters 500

Arbitrary ``--key value`` pairs are forwarded to the experiment's ``run()``
(ints/floats/bools/tuples parsed from the string).  Results print as one
JSON object.  Device selection is JAX-native (set ``JAX_PLATFORMS`` /
``CUDA_VISIBLE_DEVICES``-analog mesh flags instead of the reference's
``--gpu`` and hardcoded ``cudaSetDevice`` constants).
"""

from __future__ import annotations

import argparse
import importlib
import json
import sys

from pmpx.experiments import EXPERIMENTS


def _parse_value(v: str):
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if "," in v:
        return tuple(_parse_value(p) for p in v.split(",") if p)
    return v


def main(argv=None):
    import os

    # Some TPU transports register their PJRT plugin at interpreter start
    # and win over the JAX_PLATFORMS environment variable; re-assert the
    # user's choice through the config API (which wins back) before any
    # backend initializes.
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        try:
            jax.config.update(
                "jax_platforms", os.environ["JAX_PLATFORMS"]
            )
        except Exception:
            pass

    # Persistent compilation cache: paper-protocol runs are chunked
    # resumable subprocesses, and every fresh process otherwise re-pays
    # the remote-compile of the SAME chunk program (3-25 min for the big
    # NN supersteps).  Cache hits make a resume rung start stepping in
    # seconds.  If the backend can't serialize an executable JAX falls
    # back to compiling, so this is strictly no-worse; set
    # PMPX_NO_COMPILE_CACHE=1 to opt out.
    if not os.environ.get("PMPX_NO_COMPILE_CACHE"):
        import jax

        try:
            # home-local default: /tmp is cleared on reboot, which is
            # exactly when a relaunched queue most needs cache hits
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get(
                    "PMPX_COMPILE_CACHE_DIR",
                    os.path.expanduser("~/.cache/pmpx_jax"),
                ),
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 10.0
            )
        except Exception:
            pass

    parser = argparse.ArgumentParser(prog="pmpx")
    sub = parser.add_subparsers(dest="cmd", required=True)
    sub.add_parser("list", help="list experiments")
    runp = sub.add_parser("run", help="run an experiment")
    runp.add_argument("experiment", choices=EXPERIMENTS)
    convp = sub.add_parser(
        "convert", help="convert a pmpx binary trace to .npy "
        "(the reference's data_trans.py txt->npy step)"
    )
    convp.add_argument("trace", help="path to a TraceWriter file")
    convp.add_argument("--out", default=None, help="output .npy path")
    plotp = sub.add_parser(
        "plot", help="twin-axis loss/accuracy plot from a saved trace "
        "(the reference's look_data.py)"
    )
    plotp.add_argument("npz", help="recorder .npz with loss/acc arrays")
    plotp.add_argument("--out", default=None, help="output .pdf path")
    docp = sub.add_parser(
        "doctor", help="bounded environment/device health report "
        "(never hangs on a wedged transport)"
    )
    docp.add_argument(
        "--probe-timeout", type=float, default=120.0,
        help="seconds to wait for the device probe subprocess",
    )
    args, extra = parser.parse_known_args(argv)

    if args.cmd == "doctor":
        from pmpx.transport import doctor_report

        report = doctor_report(probe_timeout_s=args.probe_timeout)
        print(json.dumps(report, indent=2))
        return 0 if report["device"]["ok"] else 1

    if args.cmd == "convert":
        from pmpx.runtime import read_trace
        import numpy as np

        arr = read_trace(args.trace)
        out = args.out or (args.trace.rsplit(".", 1)[0] + ".npy")
        np.save(out, arr)
        print(json.dumps({"out": out, "shape": list(arr.shape)}))
        return 0

    if args.cmd == "plot":
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import numpy as np

        z = np.load(args.npz)
        fig, ax1 = plt.subplots()
        if "loss" in z:
            ax1.plot(z["loss"], color="tab:red", label="loss")
            ax1.set_ylabel("loss", color="tab:red")
        ax2 = ax1.twinx()
        for k, c in (("train_acc", "tab:blue"), ("test_acc", "tab:green")):
            if k in z:
                ax2.plot(z[k], color=c, label=k)
        ax2.set_ylabel("accuracy")
        ax1.set_xlabel("iteration")
        fig.legend()
        out = args.out or (args.npz.rsplit(".", 1)[0] + ".pdf")
        fig.savefig(out)
        print(json.dumps({"out": out}))
        return 0

    if args.cmd == "list":
        for e in EXPERIMENTS:
            mod = importlib.import_module(f"pmpx.experiments.{e}")
            doc = (mod.__doc__ or "").strip().splitlines()[0]
            print(f"{e:16s} {doc}")
        return 0

    overrides = {}
    it = iter(extra)
    for tok in it:
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument {tok!r}")
        key = tok[2:].replace("-", "_")
        try:
            val = next(it)
        except StopIteration:
            raise SystemExit(f"missing value for {tok!r}")
        overrides[key] = _parse_value(val)

    mod = importlib.import_module(f"pmpx.experiments.{args.experiment}")
    result = mod.run(**overrides)
    print(json.dumps(result, indent=2, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
