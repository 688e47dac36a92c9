"""Tests for auxiliary ops: mixup, window masking, artefacts, EMA,
morphology, uncertainty, visualization."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

KEY = jax.random.key(0)


class TestMixup:
    def test_mixup_data_interpolates(self):
        from maxstyle_tpu.ops.mixup import mixup_data, sample_mixup
        x = jnp.stack([jnp.zeros((4, 4, 1)), jnp.ones((4, 4, 1))])
        labels = jnp.asarray([[[0] * 4] * 4, [[1] * 4] * 4])
        draw = sample_mixup(KEY, 2, alpha=0.2)
        xm, ym = mixup_data(draw, x, labels, num_classes=2)
        lam = float(draw.lam)
        assert xm.shape == x.shape and ym.shape == (2, 4, 4, 2)
        np.testing.assert_allclose(np.asarray(ym).sum(-1), 1.0, atol=1e-6)

    def test_mixup_loss_finite(self):
        from maxstyle_tpu.ops.mixup import mixup_loss, sample_mixup
        logits = jax.random.normal(KEY, (2, 4, 4, 3))
        labels = jax.random.randint(jax.random.key(1), (2, 4, 4), 0, 3)
        draw = sample_mixup(KEY, 2)
        assert np.isfinite(float(mixup_loss(logits, labels, draw, 3)))


class TestWindowMasking:
    def test_inpainting_changes_blocks_only(self):
        from maxstyle_tpu.ops.mixup import random_inpainting
        img = jnp.zeros((2, 48, 48, 1)) + 0.5
        out = np.asarray(random_inpainting(KEY, img))
        changed = (out != 0.5).mean()
        assert 0.0 < changed < 0.9

    def test_outpainting_keeps_blocks(self):
        from maxstyle_tpu.ops.mixup import random_outpainting
        img = jnp.zeros((2, 48, 48, 1)) + 0.5
        out = np.asarray(random_outpainting(KEY, img))
        kept = (out == 0.5).mean()
        assert 0.0 < kept < 0.9


class TestArtefacts:
    def setup_method(self):
        rng = np.random.RandomState(0)
        y, x = np.mgrid[0:32, 0:32]
        self.vol = np.stack([np.exp(-(((y - 16) / 8) ** 2 + ((x - 16) / 8) ** 2))
                             for _ in range(3)]).astype(np.float32)
        self.rng = np.random.RandomState(1)

    @pytest.mark.parametrize("name", ["RandomMotion", "RandomSpike",
                                      "RandomGhosting", "RandomBias"])
    def test_artefact_changes_volume_finite(self, name):
        from maxstyle_tpu.data.artefacts import ARTEFACTS
        out = ARTEFACTS[name](self.vol, self.rng)
        assert out.shape == self.vol.shape
        assert np.isfinite(out).all()
        assert not np.allclose(out, self.vol)

    def test_generate_suite(self, tmp_path):
        from maxstyle_tpu.data.artefacts import generate_artefacted_suite
        from maxstyle_tpu.data.datasets import build_general_dataset
        from tests.test_data import make_synthetic_site
        root = make_synthetic_site(str(tmp_path / "src"), n_patients=1)
        ds = build_general_dataset(root, "{pid}/img.nii.gz", "{pid}/seg.nii.gz",
                                   pad_hw=(32, 32), crop_hw=(32, 32))
        out_root = str(tmp_path / "RandomSpike")
        generate_artefacted_suite(ds, out_root, "RandomSpike", repeats=2)
        assert len(os.listdir(out_root)) == 2


class TestEMA:
    def test_ema_converges_to_params(self):
        from maxstyle_tpu.utils.ema import ema_init, ema_update
        p = {"w": jnp.zeros(3)}
        target = {"w": jnp.ones(3)}
        e = ema_init(p)
        for _ in range(200):
            e = ema_update(e, target, decay=0.9)
        np.testing.assert_allclose(np.asarray(e["w"]), 1.0, atol=1e-6)

    def test_step_schedule(self):
        from maxstyle_tpu.utils.ema import make_lr_schedule
        # 'step' = StepLR gamma 0.5 (model_util.get_scheduler:685)
        sched = make_lr_schedule("step", 1.0, lr_decay_epochs=5,
                                 steps_per_epoch=10, total_epochs=20)
        assert float(sched(0)) == 1.0
        assert abs(float(sched(51)) - 0.5) < 1e-6
        assert abs(float(sched(101)) - 0.25) < 1e-6
        # 'step2' = gamma 0.1 (:687)
        sched2 = make_lr_schedule("step2", 1.0, lr_decay_epochs=5,
                                  steps_per_epoch=10, total_epochs=20)
        assert abs(float(sched2(51)) - 0.1) < 1e-6


class TestMorphology:
    def test_dilation_grows_erosion_shrinks(self):
        from maxstyle_tpu.ops.morphology import dilation2d, erosion2d
        x = jnp.zeros((1, 9, 9, 1)).at[0, 4, 4, 0].set(1.0)
        d = np.asarray(dilation2d(x))
        e = np.asarray(erosion2d(x))
        assert d.sum() == 9.0  # 3x3 neighborhood
        assert e.sum() <= 0.0 + 1e-9

    def test_gradient_extracts_boundary(self):
        from maxstyle_tpu.ops.morphology import morphological_gradient
        x = jnp.zeros((1, 16, 16, 1)).at[0, 4:12, 4:12, 0].set(1.0)
        g = np.asarray(morphological_gradient(x))
        assert g[0, 8, 8, 0] == 0.0  # interior
        assert g[0, 4, 8, 0] == 1.0  # boundary


class TestUncertainty:
    def test_entropy_bounds(self):
        from maxstyle_tpu.utils.uncertainty import entropy_map
        certain = jnp.zeros((1, 4, 4, 3)).at[..., 0].set(100.0)
        uniform = jnp.zeros((1, 4, 4, 3))
        assert float(entropy_map(certain).max()) < 1e-3
        np.testing.assert_allclose(np.asarray(entropy_map(uniform)), 1.0,
                                   atol=1e-5)


class TestVisualize:
    def test_panels_and_grid(self, tmp_path):
        from maxstyle_tpu.utils.visualize import (save_image_grid,
                                                  save_segmentation_panels)
        rng = np.random.RandomState(0)
        imgs = rng.rand(3, 16, 16)
        labs = rng.randint(0, 3, (3, 16, 16))
        p1 = save_segmentation_panels(imgs, labs, labs, str(tmp_path), "ep0")
        assert p1 and os.path.exists(p1)
        p2 = save_image_grid([imgs[0], imgs[1]], str(tmp_path / "grid.png"))
        assert os.path.exists(p2)
