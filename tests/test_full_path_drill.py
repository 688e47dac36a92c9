"""Full production-path drill on synthetic volumes (one command per surface):

    raw NIfTI tree -> data/preprocess CLI -> train CLI (three_shot split)
    -> artefacted-suite generation (data/artefacts CLI)
    -> --auto_test sweep over the FULL cardiac 9-suite registry
    -> report/dataset_summary.csv

Mirrors the reference's offline pipeline end-to-end: acdc_preprocess.py ->
train_adv_supervised_segmentation_triplet.py --auto_test (:893-959) with
generate_artefacted_data.py supplying the corrupted suites. The CSV schema
is asserted against the reference's cardiac columns (train_adv…:925-927:
dataset/method + LV/MYO/RV means + AVG + stds; ours keys the same cells by
metric as LV_Dice (mean)/… and 'Dice AVG' since it also carries HD95/ASD).
"""

import json
import os
import shutil

import numpy as np
import pytest

from maxstyle_tpu.data import medio

TRAIN_PIDS = ["002", "022", "042"]   # acdc_split('three_shot', 0)['train']
VAL_PIDS = ["011", "071"]            # few-shot validation base
TEST_PIDS = ["007", "008"]           # from ACDC_TEST_PATIENTS
EXTERNAL_SUITES = ["MSCMRSeg_C0", "MSCMRSeg_LGE", "MM", "UKBB"]
REGISTRY = ["ACDC", "RandomBias", "RandomSpike", "RandomMotion",
            "RandomGhosting"] + EXTERNAL_SUITES


def _phantom(rng, shape=(3, 40, 40)):
    img = rng.rand(*shape).astype(np.float32)
    lab = np.zeros(shape, np.int16)
    lab[:, 8:24, 8:24] = 1
    lab[:, 12:20, 12:20] = 2
    lab[:, 24:32, 24:32] = 3
    return img, lab


def _write_patient(d, img, lab, img_name, lab_name):
    os.makedirs(d, exist_ok=True)
    medio.write_nifti(os.path.join(d, img_name), img, spacing=(1.0, 1.0, 5.0))
    medio.write_nifti(os.path.join(d, lab_name), lab.astype(np.uint8),
                      spacing=(1.0, 1.0, 5.0))


@pytest.mark.slow
def test_full_path_drill(tmp_path):
    from maxstyle_tpu import train as train_cli
    from maxstyle_tpu.data import artefacts as art_cli
    from maxstyle_tpu.data import preprocess as pre_cli

    rng = np.random.RandomState(0)

    # 1. raw ACDC-format tree: {raw}/{pid}/ED_img.nii.gz (+ seg)
    raw = tmp_path / "raw"
    for pid in TRAIN_PIDS + VAL_PIDS:
        img, lab = _phantom(rng)
        _write_patient(str(raw / pid), img, lab,
                       "ED_img.nii.gz", "ED_seg.nii.gz")

    # 2. offline preprocess CLI -> {pre}/ED/{pid}_img.nrrd
    #    (incl. the LV/RV label-convention swap, acdc_preprocess.py:137-138)
    pre = tmp_path / "preprocessed"
    pre_cli.main(["--src", str(raw), "--out", str(pre), "--frames", "ED",
                  "--spacing", "1.0", "1.0", "-1.0", "--swap_lv_rv"])
    for pid in TRAIN_PIDS + VAL_PIDS:
        assert (pre / "ED" / f"{pid}_img.nrrd").exists()
        assert (pre / "ED" / f"{pid}_seg.nrrd").exists()

    # 3. OOD suite tree: the IID ACDC test site, the four artefacted copies
    #    written by the artefacts CLI, and the external cardiac sites
    #    (MSCMRSeg/MM/UKBB share the default {pid}/img.nii.gz layout)
    suites = tmp_path / "suites"
    for pid in TEST_PIDS:
        img, lab = _phantom(rng)
        _write_patient(str(suites / "ACDC" / pid), img, lab,
                       "img.nii.gz", "seg.nii.gz")
    art_cli.main(["--root_dir", str(suites / "ACDC"),
                  "--out_root", str(suites), "--artefact", "all",
                  "--crop", "32", "32", "--repeats", "1", "--seed", "3"])
    for name in EXTERNAL_SUITES:
        shutil.copytree(str(suites / "ACDC"), str(suites / name))
    for kind in ["RandomBias", "RandomSpike", "RandomMotion",
                 "RandomGhosting"]:
        assert (suites / kind / f"{TEST_PIDS[0]}_r0" / "img.nii.gz").exists()

    # 4. train CLI on the preprocessed NRRDs, then the full auto-test sweep
    config = {
        "name": "drill",
        "data": {
            "dataset_name": "ACDC",
            "root_dir": str(pre),
            "frame": ["ED"],
            "pad_size": [40, 40, 1],
            "crop_size": [32, 32, 1],
            "new_spacing": [1.0, 1.0, -1.0],
            "data_aug_policy": "ACDC_affine_elastic_intensity",
            "image_format_name": "{pid}_img.nrrd",
            "label_format_name": "{pid}_seg.nrrd",
            "num_classes": 4,
            "intensity_norm_type": "min_max",
            "keep_orig_image_label_pair_for_training": True,
        },
        "segmentation_model": {
            "network_type": "FCN_16_standard_no_STN", "num_classes": 4},
        "learning": {"lr": 1e-3, "n_epochs": 1, "batch_size": 4,
                     "max_iteration": 3, "optimizer_type": "Adam"},
        "output": {"save_epoch_every_num_epochs": 1},
    }
    cfg_path = str(tmp_path / "drill_config.json")
    with open(cfg_path, "w") as f:
        json.dump(config, f)
    save_dir = str(tmp_path / "saved")
    train_cli.main(["--json_config_path", cfg_path, "--save_dir", save_dir,
                    "--data_setting", "three_shot", "--cval", "0",
                    "--seed", "1", "--debug", "--auto_test",
                    "--test_root_dir", str(suites),
                    "--test_batch_size", "4"])

    # 5. run-dir layout + the aggregate CSV over the whole registry
    run_dir = os.path.join(save_dir, "train_ACDC_three_shot_n_cls_4",
                           "drill_config", "0")
    model_dir = os.path.join(run_dir, "model")
    assert os.path.isdir(os.path.join(model_dir, "best"))
    csv_path = os.path.join(model_dir, "report", "dataset_summary.csv")
    assert os.path.exists(csv_path), csv_path

    import pandas as pd
    df = pd.read_csv(csv_path)
    # registry order is the reference's own (train_adv…:921-925)
    assert list(df["dataset"]) == REGISTRY
    assert (df["method"] == "drill_config").all()
    # reference cardiac schema cells (train_adv…:925-927), keyed per-metric
    for cls in ["LV", "MYO", "RV"]:
        assert f"{cls}_Dice (mean)" in df.columns
        assert f"{cls}_Dice (std)" in df.columns
    assert "Dice AVG" in df.columns
    dice = df[[f"{c}_Dice (mean)" for c in ["LV", "MYO", "RV"]]].to_numpy()
    assert np.isfinite(dice).all() and (dice >= 0).all() and (dice <= 1).all()
    np.testing.assert_allclose(df["Dice AVG"].to_numpy(), dice.mean(axis=1),
                               atol=1e-8)
    # per-suite detailed reports land next to the aggregate (reference
    # save_report_dir layout, train_adv…:944-947)
    for suite in REGISTRY:
        assert os.path.isdir(os.path.join(model_dir, "report", suite)), suite
