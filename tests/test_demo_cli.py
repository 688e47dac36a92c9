"""Demo script smoke: the vis_hard_example equivalent renders a style-
composition panel from the synthetic phantom (demo_generate_styles.py)."""

import os

import pytest


@pytest.mark.slow
def test_demo_generates_panel(tmp_path):
    from maxstyle_tpu import demo_generate_styles as demo

    out = str(tmp_path / "panel.png")
    demo.main(["--out", out, "--crop", "64", "--n_samples", "2",
               "--n_iter", "1"])
    assert os.path.exists(out)
    assert os.path.getsize(out) > 1000
