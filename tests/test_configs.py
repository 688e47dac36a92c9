"""Shipped experiment configs: the full 15-file suite mirroring the
reference's `config/ACDC/{600,1500}_epoch/*` + `config/Prostate/*`
(9 methods x 2 datasets; /root/reference/config/**). Every file must parse,
build a solver, and be launchable: one CPU train step per method."""

import glob
import os

import jax
import jax.numpy as jnp
import pytest

from maxstyle_tpu.config import ExperimentConfig
from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.train_step import make_train_step

CONFIG_ROOT = os.path.join(os.path.dirname(__file__), "..", "configs")
CONFIGS = sorted(glob.glob(os.path.join(CONFIG_ROOT, "**", "*.json"),
                           recursive=True))
_ids = [os.path.relpath(p, CONFIG_ROOT) for p in CONFIGS]

METHOD_FLAGS = ("max_style", "latent_DA", "rand_conv", "RSC", "mix_style",
                "DSU", "adv_noise", "adv_bias")


@pytest.mark.parametrize("path", CONFIGS, ids=_ids)
def test_config_parses_and_builds(path):
    cfg = ExperimentConfig.from_json(path)
    solver = TripletSegmentationSolver(cfg)
    assert solver.num_classes == cfg.segmentation_model.num_classes
    if "ACDC" in path:
        assert cfg.crop_hw == (192, 192)
        assert cfg.data.num_classes == 4
    else:
        assert cfg.crop_hw == (224, 224)
        assert cfg.segmentation_model.num_classes == 2
    if os.sep + "TPU" + os.sep in path:
        # TPU production-scale configs: scaled batch with grouped style
        # stats preserving the reference's batch-20 method semantics
        assert cfg.learning.batch_size % 20 == 0
        assert cfg.max_style.style_group_size == 20
    else:
        assert cfg.learning.batch_size == 20
    assert cfg.learning.optimizer_type == "AdamW"
    if "MaxStyle" in path:
        assert cfg.learning.max_style
        assert cfg.max_style.n_iter == 5
        assert cfg.max_style.decoder_layers_indexes == (3, 4, 5)
        # the published prostate run sets always_use_beta (config/Prostate/
        # MICCAI2022_MaxStyle.json:63); the ACDC one does not
        assert cfg.max_style.always_use_beta == ("Prostate" in path)
    if "LSM" in path:
        assert cfg.learning.latent_DA
        assert cfg.latent_DA.image_code.loss_name == "mse"
        assert cfg.latent_DA.shape_code.loss_name == "ce"
    if "1500_epoch" in path:
        assert cfg.learning.n_epochs == 1500


def test_full_suite_present():
    # 3 ACDC methods x 2 budgets + 9 prostate methods = 15 launchable
    # reference-mirror files, plus TPU production-scale configs
    ref = [p for p in CONFIGS if os.sep + "TPU" + os.sep not in p]
    assert len(ref) == 15, _ids
    assert len(CONFIGS) > len(ref), "TPU production configs missing"
    flags_covered = set()
    for p in CONFIGS:
        cfg = ExperimentConfig.from_json(p)
        for f in METHOD_FLAGS:
            if getattr(cfg.learning, f):
                flags_covered.add(f)
    assert flags_covered == set(METHOD_FLAGS), flags_covered


def _unique_method_configs():
    """One representative config per method branch (prostate set covers all
    eight flags; standard training adds the no-flag baseline)."""
    picks = {}
    for p in CONFIGS:
        if "Prostate" not in p:
            continue
        cfg = ExperimentConfig.from_json(p)
        enabled = tuple(f for f in METHOD_FLAGS if getattr(cfg.learning, f))
        picks.setdefault(enabled, p)
    return sorted(picks.values())


@pytest.mark.slow
@pytest.mark.parametrize("path", _unique_method_configs(),
                         ids=lambda p: os.path.basename(p))
def test_config_launches_one_step(path):
    """Each method is launchable by file: parse -> shrink spatial dims (CPU
    budget) -> one full train step with the configured branches."""
    import dataclasses
    cfg = ExperimentConfig.from_json(path)
    data = dataclasses.replace(cfg.data, crop_size=(32, 32, 1),
                               pad_size=(40, 40, 1), image_size=(40, 40, 1),
                               label_size=(40, 40))
    ms = dataclasses.replace(cfg.max_style, n_iter=2)
    cfg = dataclasses.replace(cfg, data=data, max_style=ms)
    solver = TripletSegmentationSolver(cfg)
    batch = 4
    state = solver.init_state(jax.random.key(0), (32, 32), batch_size=batch)
    step = make_train_step(solver)
    x = jnp.clip(0.5 + 0.2 * jax.random.normal(jax.random.key(1),
                                               (batch, 32, 32, 1)), 0, 1)
    lab = jax.random.randint(jax.random.key(2), (batch, 32, 32), 0,
                             solver.num_classes)
    _, metrics = step(state, {"image": x, "label": lab}, jax.random.key(3))
    assert all(bool(jnp.isfinite(v)) for v in metrics.values()), metrics
