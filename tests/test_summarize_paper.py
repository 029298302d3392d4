"""Unit tests for scripts/summarize_paper.py's MNIST cell indexing.

The paper queue extends each (algo, model) chain through resumable
prefix rungs, so the artifact dir holds several honest-length stems of
the same cell; the summary must point the reader at the longest one and
mark the rest superseded (VERDICT r3 weak #5's stale-summary class of
bug, generalized).
"""

import importlib.util
import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def summarize():
    spec = importlib.util.spec_from_file_location(
        "sp_under_test", os.path.join(REPO, "scripts", "summarize_paper.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_run(out_dir, algo, steps, model, test_acc):
    stem = f"{algo}_alpha_0.0001_sample_number_{steps}{model}_N_7"
    np.save(os.path.join(out_dir, stem + ".loss.npy"),
            np.linspace(2.0, 0.5, steps).astype(np.float32))
    with open(os.path.join(out_dir, stem + ".json"), "w") as f:
        json.dump({"model": model, "num_steps": steps,
                   "test_acc": test_acc,
                   "steady_ms_per_superstep": 1.0}, f)
    return stem


def test_mnist_summary_marks_prefix_rungs_superseded(summarize, tmp_path):
    out = str(tmp_path)
    s_old = _fake_run(out, "PMP", 1000, "CNN", 0.90)
    s_new = _fake_run(out, "PMP", 5000, "CNN", 0.93)
    s_mh = _fake_run(out, "MH", 2000, "CNN", 0.88)
    s_fc = _fake_run(out, "PMP", 3000, "FC", 0.94)

    kdir = str(tmp_path / "kernel")
    os.makedirs(kdir)
    s_k = _fake_run(kdir, "PMP", 8000, "LSTM", 0.61)

    summarize.mnist(out_dir=out, kernel_dir=kdir)
    with open(os.path.join(out, "summary.json")) as f:
        res = json.load(f)

    assert res["current_cells"] == {
        "MH_CNN": s_mh, "PMP_CNN": s_new, "PMP_FC": s_fc,
        "PMP_LSTM_kernel": s_k + "@kernel",
    }
    assert res[s_k + "@kernel"]["path"] == "fused_kernel"
    assert res[s_old]["superseded_by"] == s_new
    for stem in (s_new, s_mh, s_fc):
        assert "superseded_by" not in res[stem]
    # honest fractions against the reference protocol lengths
    assert res[s_new]["fraction_of_reference_protocol"] == round(
        5000 / 250000, 3)
    assert os.path.exists(os.path.join(out, "curves.pdf"))


def test_mnist_curves_overlays_kernel_dir(summarize, tmp_path, monkeypatch):
    """The per-model figure must include the fused-kernel-path chains
    (dashed ALGO@kernel) from the separate protocol dir — the 1M-ladder
    kernel LSTM run has to be visible next to the XLA-path cells."""
    out = str(tmp_path / "paper")
    kdir = str(tmp_path / "kernel")
    os.makedirs(out)
    os.makedirs(kdir)
    _fake_run(out, "PMP", 500, "LSTM", 0.60)
    _fake_run(kdir, "PMP", 900, "LSTM", 0.61)

    calls = {}
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.axes

    orig = matplotlib.axes.Axes.plot

    def spy(self, *args, **kw):
        calls[kw.get("label", "")] = kw.get("ls")
        return orig(self, *args, **kw)

    monkeypatch.setattr(matplotlib.axes.Axes, "plot", spy)
    summarize._mnist_curves_pdf(out, kernel_dir=kdir)
    assert calls.get("PMP (500 steps)") == "-"
    assert calls.get("PMP@kernel (900 steps)") == "--"


def test_ess_paths_overlay_ratios(summarize, tmp_path):
    """ess() overlays the scan and fused 1M-step P sweeps and records
    the per-cell fused/scan ratio on the all-stream estimator."""
    sdir, fdir, odir = (str(tmp_path / d) for d in ("scan", "fused", "out"))
    for d, scale in ((sdir, 1.0), (fdir, 2.5)):
        os.makedirs(d)
        rows = {}
        for P in (8, 512):
            rows[f"pmp_P{P}_all_ess_per_s"] = 100.0 * P * scale
            rows[f"pmp_P{P}_all_msjd_per_s"] = 10.0 * P * scale
            rows[f"pmp_P{P}_ess_per_s"] = 1.0  # root path: ignored
        with open(os.path.join(d, "summary.json"), "w") as f:
            json.dump(rows, f)
    summarize.ess(scan_dir=sdir, fused_dir=fdir, out_dir=odir)
    with open(os.path.join(odir, "ess_paths.json")) as f:
        res = json.load(f)
    assert res["fused_over_scan"]["ess_per_s"] == {
        "pmp_P8": 2.5, "pmp_P512": 2.5}
    assert res["fused_over_scan"]["msjd_per_s"]["pmp_P8"] == 2.5
    assert os.path.exists(os.path.join(odir, "ess_paths_compare.pdf"))
    assert os.path.exists(os.path.join(odir, "msjd_paths_compare.pdf"))
