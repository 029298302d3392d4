"""Unit tests for the paper-summary machinery (scripts/summarize_paper).

The summary index is what the queue's terminal stages publish and what
downstream readers (curves.pdf, README tables) trust: per-cell honest
step counts, superseded-prefix marking, and the freeze rule for XLA
cells whose protocol continues on a kernel path.
"""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def summarize():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "summarize_paper", os.path.join(root, "scripts",
                                        "summarize_paper.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["summarize_paper"] = mod
    spec.loader.exec_module(mod)
    return mod


def _write_cell(d, stem, steps, model, acc=0.9, ms=10.0):
    np.save(os.path.join(d, stem + ".loss.npy"),
            np.linspace(2.0, 1.0, steps))
    with open(os.path.join(d, stem + ".json"), "w") as f:
        json.dump({"model": model, "train_acc": acc, "test_acc": acc,
                   "num_steps": steps,
                   "steady_ms_per_superstep": ms}, f)


def test_mnist_summary_index(summarize, tmp_path):
    out = tmp_path / "paper"
    kern = tmp_path / "kernel"
    out.mkdir(), kern.mkdir()
    # XLA-path cells: a full FC cell, a short LSTM prefix, and a
    # superseded shorter prefix of the FC run
    _write_cell(str(out), "PMP_alpha_0.0001_sample_number_500000FC_N_7",
                5000, "FC")
    _write_cell(str(out), "PMP_alpha_0.0001_sample_number_250000FC_N_7",
                2500, "FC")
    _write_cell(str(out), "MP_alpha_0.0001_sample_number_12000LSTM_N_7",
                1200, "LSTM")
    # kernel-path sibling carrying the LSTM protocol further
    _write_cell(str(kern), "MP_alpha_0.0001_sample_number_300000LSTM_N_7",
                3000, "LSTM")
    summarize.mnist(out_dir=str(out), kernel_dir=str(kern))
    s = json.load(open(out / "summary.json"))

    cells = s["current_cells"]
    assert cells["PMP_FC"] == "PMP_alpha_0.0001_sample_number_500000FC_N_7"
    assert cells["MP_LSTM_kernel"].endswith("@kernel")
    # the shorter FC prefix points at the longer run
    assert (s["PMP_alpha_0.0001_sample_number_250000FC_N_7"]
            ["superseded_by"]
            == "PMP_alpha_0.0001_sample_number_500000FC_N_7")
    # freeze rule: the XLA LSTM cell (kernel sibling exists) is final...
    lstm = s["MP_alpha_0.0001_sample_number_12000LSTM_N_7"]
    assert lstm.get("final") is True
    assert "never spliced" in lstm["frozen_note"]
    # ...while the FC cell (no kernel sibling) is not frozen
    fc = s["PMP_alpha_0.0001_sample_number_500000FC_N_7"]
    assert "final" not in fc and "frozen_note" not in fc
    # kernel cells report their path and honest protocol fraction
    kcell = s[cells["MP_LSTM_kernel"]]
    assert kcell["path"] == "fused_kernel"
    assert kcell["fraction_of_reference_protocol"] == round(
        3000 / 1000000, 3
    )
    # curves rendered next to the summary
    assert (out / "curves.pdf").exists()
