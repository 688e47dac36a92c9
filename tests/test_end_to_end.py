"""Full-pipeline integration test: synthetic NIfTI site on disk -> training
via the driver loop -> checkpointing -> volumetric evaluation harness
(the `--debug` smoke path of SURVEY §4)."""

import os

import jax
import numpy as np
import pytest

from maxstyle_tpu.config import (DataConfig, ExperimentConfig, LearningConfig,
                                 MaxStyleConfig, OutputConfig,
                                 SegmentationModelConfig)
from maxstyle_tpu.data.datasets import build_general_dataset
from maxstyle_tpu.evaluate import TestSegmentationNetwork, evaluate
from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.train import train_network
from maxstyle_tpu.utils import checkpoint as ckpt
from tests.test_data import make_synthetic_site


@pytest.fixture(scope="module")
def site(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    make_synthetic_site(str(root / "train_site"), n_patients=3,
                        shape=(4, 40, 40))
    make_synthetic_site(str(root / "SUITE_A"), n_patients=2, shape=(3, 40, 40),
                        seed=5)
    return root


def tiny_config():
    return ExperimentConfig(
        data=DataConfig(dataset_name="ACDC", pad_size=(40, 40, 1),
                        crop_size=(32, 32, 1), num_classes=4,
                        data_aug_policy="ACDC_affine_elastic_intensity"),
        segmentation_model=SegmentationModelConfig(
            network_type="FCN_16_standard_no_STN", num_classes=4),
        learning=LearningConfig(lr=1e-3, batch_size=4, n_epochs=2,
                                optimizer_type="Adam", max_style=False),
        output=OutputConfig(save_epoch_every_num_epochs=100),
    )


class TestEndToEnd:
    @pytest.mark.slow
    def test_train_eval_checkpoint_cycle(self, site, tmp_path):
        cfg = tiny_config()
        solver = TripletSegmentationSolver(cfg)
        train_ds = build_general_dataset(str(site / "train_site"),
                                         "{pid}/img.nii.gz", "{pid}/seg.nii.gz",
                                         pad_hw=(40, 40), crop_hw=(32, 32))
        model_dir = str(tmp_path / "model")
        state, best = train_network(
            "e2e", solver, train_ds, train_ds, cfg, model_dir=model_dir,
            log_dir=str(tmp_path / "log"), seed=0, log=True, max_epochs=2)
        assert np.isfinite(best)
        assert os.path.isdir(os.path.join(model_dir, "best"))
        assert os.path.isdir(os.path.join(model_dir, "epoch_0"))

        # reload the best checkpoint and run the volumetric harness
        template = solver.init_state(jax.random.key(0), (32, 32), batch_size=4)
        restored, meta = ckpt.load_checkpoint(model_dir, "best", template)
        assert "epoch" in meta

        test_ds = build_general_dataset(str(site / "SUITE_A"),
                                        "{pid}/img.nii.gz", "{pid}/seg.nii.gz",
                                        pad_hw=(40, 40), crop_hw=(32, 32))
        harness = TestSegmentationNetwork(
            solver, restored, test_ds, maximum_batch_size=2,
            metrics_list=("Dice", "HD"), class_names=["c1", "c2", "c3"],
            save_report_dir=str(tmp_path / "report"))
        means, stds = harness.run()
        assert len(means) == 6  # 3 classes x 2 metrics
        assert all(np.isfinite(m) for m in means)
        assert os.path.exists(str(tmp_path / "report" / "iter_1_detailed.csv"))
        assert os.path.exists(str(tmp_path / "report" / "iter_1_summary.csv"))

    def test_evaluate_wrapper(self, site, tmp_path):
        cfg = tiny_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=2)
        means, stds, df = evaluate(
            solver, state, "SUITE_A", str(site), crop_hw=(32, 32),
            maximum_batch_size=2, save_report_dir=str(tmp_path / "rep"))
        assert len(means) == 9  # 3 classes x (Dice, HD95, ASD)
        assert len(df) == 2  # two patients
        means_d, _, _ = evaluate(
            solver, state, "SUITE_A", str(site), crop_hw=(32, 32),
            maximum_batch_size=2, metrics_list=("Dice",))
        assert len(means_d) == 3

    def test_evaluate_wrapper_sharded(self, site):
        # the mesh= plumbing: same Dice means as single-device eval
        import numpy as np
        from maxstyle_tpu.parallel import mesh as pmesh
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        cfg = tiny_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=2)
        m_single, _, _ = evaluate(solver, state, "SUITE_A", str(site),
                                  crop_hw=(32, 32), maximum_batch_size=2,
                                  metrics_list=("Dice",))
        m_shard, _, _ = evaluate(solver, state, "SUITE_A", str(site),
                                 crop_hw=(32, 32), maximum_batch_size=2,
                                 metrics_list=("Dice",),
                                 mesh=pmesh.make_mesh(8))
        np.testing.assert_allclose(m_shard, m_single, rtol=1e-6)

    def test_checkpoint_roundtrip_identical(self, tmp_path):
        cfg = tiny_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=2)
        ckpt.save_checkpoint(str(tmp_path), "best", state, epoch=3,
                             best_score=0.5, network_type="x")
        restored, meta = ckpt.load_checkpoint(str(tmp_path), "best", state)
        assert meta["epoch"] == 3
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestAutoTest:
    """The post-training benchmark sweep (train_adv…:893-959 ->
    evaluate.auto_test): suite discovery, per-suite evaluation, summary CSV,
    skip + all-missing behaviors."""

    @pytest.mark.slow
    def test_sweep_writes_summary_and_skips_missing(self, tmp_path):
        import numpy as np
        import pandas as pd

        from maxstyle_tpu.evaluate import auto_test
        from tests.test_data import make_synthetic_site

        # two prostate suites present, the rest absent -> evaluated + skipped
        root = str(tmp_path / "testsets")
        for i, suite in enumerate(("G-MedicalDecathlon", "E-BIDMC")):
            make_synthetic_site(os.path.join(root, suite), n_patients=2,
                                shape=(3, 32, 32), seed=100 + i)

        cfg = tiny_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=2)
        save_dir = str(tmp_path / "out")
        df = auto_test(solver, state, "Prostate", root, save_dir,
                       method_name="smoke", crop_hw=(32, 32),
                       maximum_batch_size=2, metrics_list=("Dice",))
        assert len(df) == 2
        assert set(df["dataset"]) == {"G-MedicalDecathlon", "E-BIDMC"}
        assert (df["method"] == "smoke").all()
        csv_path = os.path.join(save_dir, "report", "dataset_summary.csv")
        assert os.path.exists(csv_path)
        loaded = pd.read_csv(csv_path)
        mean_cols = [c for c in loaded.columns if c.endswith("(mean)")]
        assert mean_cols and np.isfinite(loaded[mean_cols].to_numpy()).all()

    def test_all_missing_raises(self, tmp_path):
        from maxstyle_tpu.evaluate import auto_test
        cfg = tiny_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=2)
        with pytest.raises(FileNotFoundError):
            auto_test(solver, state, "Prostate", str(tmp_path / "empty"),
                      str(tmp_path / "out"), crop_hw=(32, 32))
