"""CLI smoke test: `maxstyle_tpu.train.main` end-to-end on a synthetic
prostate-format dataset (mirrors the reference's --debug fast path)."""

import json
import os

import numpy as np
import pytest

from maxstyle_tpu.data import medio


def make_prostate_site(root, n_patients=8, shape=(3, 40, 40), seed=0):
    rng = np.random.RandomState(seed)
    for i in range(n_patients):
        pid = f"patient_{i}"
        os.makedirs(os.path.join(root, pid), exist_ok=True)
        img = rng.rand(*shape).astype(np.float32)
        lab = np.zeros(shape, np.int16)
        lab[:, 10:30, 10:30] = 1
        medio.write_nifti(os.path.join(root, pid, "t2_img_clipped.nii.gz"),
                          img, spacing=(1.0, 1.0, 3.6))
        medio.write_nifti(os.path.join(root, pid, "label_clipped.nii.gz"),
                          lab, spacing=(1.0, 1.0, 3.6))
    return root


@pytest.mark.slow
def test_cli_train_smoke(tmp_path):
    from maxstyle_tpu import train as train_cli

    root = make_prostate_site(str(tmp_path / "prostate"))
    config = {
        "name": "cli smoke",
        "data": {
            "dataset_name": "Prostate",
            "root_dir": root,
            "pad_size": [40, 40, 1],
            "crop_size": [32, 32, 1],
            "data_aug_policy": "Prostate_affine_elastic_intensity",
            "image_format_name": "{pid}/t2_img_clipped.nii.gz",
            "label_format_name": "{pid}/label_clipped.nii.gz",
            "num_classes": 2,
            "intensity_norm_type": "min_max",
            "keep_orig_image_label_pair_for_training": True,
        },
        "segmentation_model": {
            "network_type": "FCN_16_standard_no_STN", "num_classes": 2},
        "learning": {"lr": 1e-3, "n_epochs": 1, "batch_size": 4,
                     "max_iteration": 3, "optimizer_type": "Adam"},
        "output": {"save_epoch_every_num_epochs": 1},
    }
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)

    save_dir = str(tmp_path / "saved")
    train_cli.main(["--json_config_path", cfg_path, "--save_dir", save_dir,
                    "--data_setting", "all", "--cval", "0", "--seed", "1",
                    "--debug"])
    run_dir = os.path.join(save_dir, "train_Prostate_all_n_cls_2", "config", "0")
    assert os.path.isdir(os.path.join(run_dir, "model", "best"))
    assert os.path.exists(os.path.join(run_dir, "config.json"))


@pytest.mark.slow
def test_cli_interrupt_and_resume(tmp_path, monkeypatch):
    """Kill-and-resume (VERDICT r2 #7): a crash mid-training saves the
    'interrupted' snapshot (train.py catch-all, mirroring train_adv…:580-584)
    and --resume_ckpt_path restores epoch + state and continues to completion
    (reference --resume_pkl_path contract, train_adv…:852-855)."""
    from maxstyle_tpu import train as train_cli
    from maxstyle_tpu.config import ExperimentConfig
    from maxstyle_tpu.solver import TripletSegmentationSolver
    from maxstyle_tpu.utils import checkpoint as ckpt
    from maxstyle_tpu import prng

    root = make_prostate_site(str(tmp_path / "prostate"))
    config = {
        "name": "resume test",
        "data": {
            "dataset_name": "Prostate",
            "root_dir": root,
            "pad_size": [40, 40, 1],
            "crop_size": [32, 32, 1],
            "data_aug_policy": "Prostate_affine_elastic_intensity",
            "image_format_name": "{pid}/t2_img_clipped.nii.gz",
            "label_format_name": "{pid}/label_clipped.nii.gz",
            "num_classes": 2,
            "intensity_norm_type": "min_max",
            "keep_orig_image_label_pair_for_training": True,
        },
        "segmentation_model": {
            "network_type": "FCN_16_standard_no_STN", "num_classes": 2},
        "learning": {"lr": 1e-3, "n_epochs": 3, "batch_size": 4,
                     "optimizer_type": "Adam"},
        "output": {"save_epoch_every_num_epochs": 1},
    }
    cfg_path = str(tmp_path / "config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    save_dir = str(tmp_path / "saved")
    args = ["--json_config_path", cfg_path, "--save_dir", save_dir,
            "--data_setting", "all", "--cval", "0", "--seed", "1"]
    run_dir = os.path.join(save_dir, "train_Prostate_all_n_cls_2", "config", "0")
    model_dir = os.path.join(run_dir, "model")

    # crash during epoch 1's validation (epoch 0 completes cleanly)
    real_eval = train_cli.eval_model
    calls = {"n": 0}

    def dying_eval(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("synthetic crash")
        return real_eval(*a, **kw)

    monkeypatch.setattr(train_cli, "eval_model", dying_eval)
    with pytest.raises(RuntimeError, match="synthetic crash"):
        train_cli.main(args)
    monkeypatch.setattr(train_cli, "eval_model", real_eval)

    assert os.path.isdir(os.path.join(model_dir, "interrupted"))
    cfg = ExperimentConfig.from_json(cfg_path)
    solver = TripletSegmentationSolver(cfg)
    template = solver.init_state(prng.make_key(0), (32, 32), batch_size=4)
    snap, meta = ckpt.load_checkpoint(model_dir, "interrupted", template)
    assert meta["epoch"] == 1  # crashed during epoch 1
    steps_at_crash = int(snap.step)
    assert steps_at_crash > 0

    # resume: restarts from epoch 1 and completes epochs 1..2
    train_cli.main(args + ["--resume_ckpt_path", model_dir])
    final, meta2 = ckpt.load_checkpoint(model_dir, "epoch_2", template)
    assert meta2["epoch"] == 2
    # step counter continued from the snapshot (epoch 1 re-run + epoch 2)
    assert int(final.step) > steps_at_crash
