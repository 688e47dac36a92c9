"""Training driver + CLI.

Redesign of /root/reference/src/train_adv_supervised_segmentation_triplet.py
(:92-584 `train_network`, :588-959 `__main__`): same argparse surface
(--json_config_path --cval --seed --data_setting --auto_test --no_train
--log --save_dir --resume …), same run-directory layout
`{save_dir}/train_{dataset}_{setting}_n_cls_{K}/{config}/{cval}/{log,model}`,
same per-epoch validation-mIoU model selection — but the per-iteration work
is one jitted XLA program and augmentation runs on device:

  host loader (raw padded slices) -> device augment_batch (aug pair)
  + norm_batch (orig pair) -> concat -> train_step.

The aug+orig concatenation reproduces get_image_label (train_adv…:66-74)
with the loader batch halved when keep_orig is on (:113-117).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from maxstyle_tpu import prng
from maxstyle_tpu.config import ExperimentConfig
from maxstyle_tpu.data import augment as A
from maxstyle_tpu.data.datasets import (HostBatchLoader, build_acdc_dataset,
                                        build_prostate_dataset)
from maxstyle_tpu.metrics import RunningScore
from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.utils import checkpoint as ckpt


def build_datasets(cfg: ExperimentConfig, data_setting: str, cval: int):
    d = cfg.data
    pad_hw = (d.pad_size[0], d.pad_size[1])
    crop_hw = (d.crop_size[0], d.crop_size[1])
    common = dict(pad_hw=pad_hw, crop_hw=crop_hw, new_spacing=d.new_spacing,
                  myocardium_only=d.myocardium_only,
                  right_ventricle_only=d.right_ventricle_only)
    if "ACDC" in d.dataset_name:
        train = build_acdc_dataset(d.root_dir, "train", data_setting, cval,
                                   frames=d.frame,
                                   image_format_name=d.image_format_name,
                                   label_format_name=d.label_format_name,
                                   **common)
        val = build_acdc_dataset(d.root_dir, "validate", data_setting, cval,
                                 frames=d.frame,
                                 image_format_name=d.image_format_name,
                                 label_format_name=d.label_format_name,
                                 **common)
    elif "Prostate" in d.dataset_name:
        common.pop("myocardium_only")
        common.pop("right_ventricle_only")
        train = build_prostate_dataset(d.root_dir, "train", data_setting, cval,
                                       image_format_name=d.image_format_name,
                                       label_format_name=d.label_format_name,
                                       **common)
        val = build_prostate_dataset(d.root_dir, "validate", data_setting, cval,
                                     image_format_name=d.image_format_name,
                                     label_format_name=d.label_format_name,
                                     **common)
    else:
        raise NotImplementedError(d.dataset_name)
    return train, val


def make_device_batch(raw_batch: Dict[str, np.ndarray], key: jax.Array,
                      policy: A.AugPolicy, crop_hw, keep_orig: bool):
    """Raw padded slices -> training batch: augmented pair (+ the norm-only
    original pair concatenated, when keep_orig)."""
    images = jnp.asarray(raw_batch["image"])
    labels = jnp.asarray(raw_batch["label"])
    aug_img, aug_lab = A.augment_batch(key, images, labels, policy)
    if keep_orig:
        orig_img, orig_lab = A.norm_batch(images, labels, crop_hw)
        return {"image": jnp.concatenate([aug_img, orig_img], axis=0),
                "label": jnp.concatenate([aug_lab, orig_lab], axis=0)}
    return {"image": aug_img, "label": aug_lab}


def make_eval_predict(solver, n_iter: int = 2):
    """Jitted validation predictor, built ONCE per run (a fresh closure per
    epoch would recompile every epoch)."""

    @jax.jit
    def predict(params, stats, x):
        logits = solver.predict(params, stats, x, n_iter=n_iter,
                                normalize_input=True)
        return jnp.argmax(logits, axis=-1)

    return predict


def eval_model(solver, state, val_loader, policy, crop_hw, key,
               n_iter: int = 2, predict=None):
    """Per-epoch validation: augmented val batches -> RunningScore mIoU
    (train_adv…eval_model:76-89; note the reference also evaluates on
    randomly-augmented validation samples)."""
    running = RunningScore(solver.num_classes)
    if predict is None:
        predict = make_eval_predict(solver, n_iter)

    for i, raw in enumerate(val_loader):
        batch = make_device_batch(raw, jax.random.fold_in(key, i), policy,
                                  crop_hw, keep_orig=False)
        pred = predict(state.params, state.batch_stats, batch["image"])
        running.update(np.asarray(batch["label"]), np.asarray(pred))
    score = running.get_scores()
    return score["Mean IoU : \t"], score["Mean Acc : \t"]


class ScalarLogger:
    """Loss-channel logging: cumulative-average scalars like the reference
    TensorBoard writer (train_adv…:538-541) + JSON export (:574-579).
    Event files are written by the dependency-free utils/tb_events.py, so
    `tensorboard --logdir <save_dir>` works as in the reference
    (README.md:146-151) without importing TensorFlow."""

    def __init__(self, log_dir: Optional[str], enabled: bool):
        self.totals: Dict[str, float] = {}
        self.count = 0
        self.history = []
        self._pending = []
        self.writer = None
        if enabled and log_dir:
            os.makedirs(log_dir, exist_ok=True)
            from maxstyle_tpu.utils.tb_events import EventFileWriter
            self.writer = EventFileWriter(log_dir)
            self.log_dir = log_dir
        else:
            self.log_dir = None

    def log_step(self, metrics: Dict[str, jnp.ndarray]):
        # keep device arrays — converting here would force a device sync per
        # scalar per step; everything is fetched in one transfer at epoch end
        self.count += 1
        self._pending.append(metrics)

    def _drain(self):
        if self._pending:
            host = jax.device_get(self._pending)
            for step_metrics in host:
                for k, v in step_metrics.items():
                    self.totals[k] = self.totals.get(k, 0.0) + float(v)
            self._pending = []

    def log_epoch(self, epoch: int, val_iou: float, val_acc: float):
        self._drain()
        if self.writer is not None:
            scalars = {k: v / max(self.count, 1) for k, v in self.totals.items()}
            scalars["iou/val_iou"] = val_iou
            scalars["acc/val_acc"] = val_acc
            self.writer.add_scalars(scalars, epoch)
        self.history.append({"epoch": epoch, "val_iou": val_iou,
                             "val_acc": val_acc,
                             **{k: v / max(self.count, 1)
                                for k, v in self.totals.items()}})

    def export(self, name: str):
        if self.log_dir:
            with open(os.path.join(self.log_dir, f"{name}.json"), "w") as f:
                json.dump(self.history, f, indent=1)

    def close(self):
        if self.writer is not None:
            self.writer.close()
            self.writer = None


def train_network(experiment_name: str, solver: TripletSegmentationSolver,
                  train_set, validate_set, cfg: ExperimentConfig, *,
                  model_dir: str, log_dir: Optional[str] = None,
                  seed: Optional[int] = None, log: bool = False,
                  debug: bool = False, start_epoch: int = 0,
                  state=None, max_epochs: Optional[int] = None,
                  inner_steps: int = 1, data_parallel: bool = False):
    """The epoch loop (train_adv…train_network:92-584). Returns final state."""
    L = cfg.learning
    d = cfg.data
    crop_hw = (d.crop_size[0], d.crop_size[1])
    pad_hw = (d.pad_size[0], d.pad_size[1])
    keep_orig = d.keep_orig_image_label_pair_for_training
    policy = A.get_policy(d.data_aug_policy, pad_hw, crop_hw,
                          image_interp=d.image_interp)

    root_key = prng.make_key(seed)
    if state is None:
        state = solver.init_state(prng.fold_name(root_key, "init"), crop_hw,
                                  batch_size=L.batch_size)
    from maxstyle_tpu.train_step import make_fused_train_step, make_multi_step
    mesh = None
    if data_parallel and len(jax.devices()) > 1:
        # SPMD data parallelism: state replicated, raw batch split on 'data';
        # XLA all-reduces gradients over ICI (parallel/mesh.py)
        from maxstyle_tpu.parallel import mesh as pmesh
        mesh = pmesh.make_mesh()
        n_dev = mesh.shape[pmesh.DATA_AXIS]
        assert cfg.train_batch_size % n_dev == 0, (
            f"train batch {cfg.train_batch_size} must divide over "
            f"{n_dev} devices")
        state = pmesh.replicate(state, mesh)
        # shard_map'd augmentation: the pallas warp is unpartitionable
        # under GSPMD and would replicate on every chip otherwise
        raw_step = make_fused_train_step(solver, policy, keep_orig,
                                         jit_compile=False, mesh=mesh)
        sharded = pmesh.shard_train_step(raw_step, mesh)

        def step(st, raw_dev, rng):
            return sharded(st, pmesh.shard_batch(raw_dev, mesh),
                           pmesh.replicate(rng, mesh))
    elif inner_steps > 1:
        multi = make_multi_step(solver, policy, keep_orig, n_inner=inner_steps)

        def step(st, raw_list, rng):
            stacked = {k: np.stack([r[k] for r in raw_list])
                       for k in raw_list[0]}
            return multi(st, jax.tree_util.tree_map(jnp.asarray, stacked), rng)
    else:
        step = make_fused_train_step(solver, policy, keep_orig)
    loader = HostBatchLoader(train_set, cfg.train_batch_size, seed=seed)
    val_loader = HostBatchLoader(validate_set, L.batch_size, seed=seed,
                                 drop_last=False, shuffle=False)
    eval_predict = make_eval_predict(solver)
    logger = ScalarLogger(log_dir, log)

    best_score = -1e9
    g_count = 0
    stop = False
    n_epochs = max_epochs if max_epochs is not None else L.n_epochs
    last_epoch = start_epoch
    try:
        for epoch in range(start_epoch, n_epochs):
            last_epoch = epoch
            t0 = time.time()
            from maxstyle_tpu.data.prefetch import prefetch
            pending = []
            for i_iter, raw in enumerate(prefetch(loader, depth=2)):
                if debug and i_iter > 20:
                    break
                k = jax.random.fold_in(prng.fold_name(root_key, "step"), g_count)
                if inner_steps > 1:
                    pending.append(raw)
                    if len(pending) < inner_steps:
                        continue
                    state, metrics = step(state, pending, k)
                    pending = []
                    g_count += inner_steps
                else:
                    raw_dev = {"image": jnp.asarray(raw["image"]),
                               "label": jnp.asarray(raw["label"])}
                    state, metrics = step(state, raw_dev, k)
                    g_count += 1
                logger.log_step(metrics)
                if i_iter > L.max_iteration:
                    stop = True
            dt = time.time() - t0
            val_iou, val_acc = eval_model(
                solver, state, val_loader, policy, crop_hw,
                jax.random.fold_in(prng.fold_name(root_key, "val"), epoch),
                predict=eval_predict)
            logger.log_epoch(epoch, val_iou, val_acc)
            print(f"{experiment_name} epoch {epoch}: val mIoU {val_iou:.4f} "
                  f"acc {val_acc:.4f} ({dt:.1f}s)")

            if val_iou > best_score:
                best_score = val_iou
                ckpt.save_checkpoint(model_dir, "best", state, epoch,
                                     best_score, solver.spec.network_type)
            if (epoch + 1) % cfg.output.save_epoch_every_num_epochs == 0 or epoch == 0:
                ckpt.save_checkpoint(model_dir, f"epoch_{epoch}", state, epoch,
                                     best_score, solver.spec.network_type)
            if stop:
                break
        logger.export(experiment_name.replace("/", "_"))
    except (KeyboardInterrupt, Exception):
        # interrupt snapshot + resume path: the reference wraps the whole
        # loop in a catch-all that saves a snapshot (train_adv…:580-584)
        if last_epoch > start_epoch:
            path = ckpt.save_checkpoint(model_dir, "interrupted", state,
                                        last_epoch, best_score,
                                        solver.spec.network_type)
            print(f"interrupted at epoch {last_epoch}; snapshot at {path}")
        raise
    return state, best_score


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="TPU-native adversarial-style robust segmentation training")
    parser.add_argument("--json_config_path", type=str, required=True)
    parser.add_argument("--dataset_name", type=str, default=None)
    parser.add_argument("--cval", type=int, default=0)
    parser.add_argument("--data_setting", type=str, default="10")
    parser.add_argument("--resume_ckpt_path", type=str, default=None,
                        help="model_dir containing an orbax checkpoint to resume")
    parser.add_argument("--test_model_dir_path", type=str, default=None)
    parser.add_argument("--torch_ckpt_dir", type=str, default=None,
                        help="directory of reference per-module .pth files "
                             "to import (migration from the PyTorch impl)")
    parser.add_argument("--save_dir", type=str, default="./saved/")
    parser.add_argument("--log", action="store_true", default=True)
    parser.add_argument("--seed", type=int, default=None)
    parser.add_argument("--debug", action="store_true", default=False)
    parser.add_argument("--auto_test", action="store_true", default=False)
    parser.add_argument("--test_root_dir", type=str, default=None,
                        help="root containing the OOD test suites")
    parser.add_argument("--test_batch_size", type=int, default=25)
    parser.add_argument("--no_train", action="store_true", default=False)
    parser.add_argument("--use_last_epoch", action="store_true", default=False)
    parser.add_argument("--inner_steps", type=int, default=1,
                        help="optimizer steps per XLA dispatch (lax.scan); "
                             ">1 amortizes host dispatch on fast steps")
    parser.add_argument("--data_parallel", action="store_true", default=False,
                        help="shard the batch over all devices (SPMD DP)")
    opt = parser.parse_args(argv)

    from maxstyle_tpu.utils.backend import enable_persistent_cache
    enable_persistent_cache()  # re-runs/resumes load instead of recompiling
    cfg = ExperimentConfig.from_json(opt.json_config_path)
    solver = TripletSegmentationSolver(cfg)

    project = (f"train_{cfg.data.dataset_name}_{opt.data_setting}"
               f"_n_cls_{cfg.segmentation_model.num_classes}")
    config_name = os.path.splitext(os.path.basename(opt.json_config_path))[0]
    experiment_name = f"{config_name}/{opt.cval}"
    run_dir = os.path.join(opt.save_dir, project, config_name, str(opt.cval))
    log_dir = os.path.join(run_dir, "log")
    model_dir = os.path.join(run_dir, "model")
    os.makedirs(log_dir, exist_ok=True)
    os.makedirs(model_dir, exist_ok=True)
    shutil.copyfile(opt.json_config_path, os.path.join(run_dir, "config.json"))

    state = None
    start_epoch = 0
    if opt.torch_ckpt_dir:
        from maxstyle_tpu.utils.torch_import import import_module_checkpoint
        state = solver.init_state(prng.make_key(0),
                                  (cfg.crop_hw[0], cfg.crop_hw[1]),
                                  batch_size=cfg.learning.batch_size)
        import jax.numpy as _jnp
        new_params = dict(state.params)
        new_stats = dict(state.batch_stats)
        for name in state.params:
            path = os.path.join(opt.torch_ckpt_dir, f"{name}.pth")
            if os.path.exists(path):
                p, s = import_module_checkpoint(path, name, solver.spec)
                new_params[name] = jax.tree_util.tree_map(_jnp.asarray, p)
                new_stats[name] = jax.tree_util.tree_map(_jnp.asarray, s)
                print(f"imported torch weights for {name}")
        state = state.replace(params=new_params, batch_stats=new_stats)
    if opt.resume_ckpt_path:
        template = solver.init_state(prng.make_key(0),
                                     (cfg.crop_hw[0], cfg.crop_hw[1]),
                                     batch_size=cfg.learning.batch_size)
        state, meta = ckpt.load_checkpoint(opt.resume_ckpt_path, "interrupted",
                                           template)
        start_epoch = meta.get("epoch", 0)
        print(f"resumed from {opt.resume_ckpt_path} at epoch {start_epoch}")

    if not opt.no_train:
        train_set, validate_set = build_datasets(cfg, opt.data_setting, opt.cval)
        state, _ = train_network(experiment_name, solver, train_set,
                                 validate_set, cfg, model_dir=model_dir,
                                 log_dir=log_dir, seed=opt.seed, log=opt.log,
                                 debug=opt.debug, start_epoch=start_epoch,
                                 state=state, inner_steps=opt.inner_steps,
                                 data_parallel=opt.data_parallel)

    if opt.auto_test:
        from maxstyle_tpu.evaluate import auto_test
        template = solver.init_state(prng.make_key(0),
                                     (cfg.crop_hw[0], cfg.crop_hw[1]),
                                     batch_size=cfg.learning.batch_size)
        name = None
        if opt.test_model_dir_path:
            load_dir, name = os.path.split(opt.test_model_dir_path)
        elif opt.use_last_epoch:
            load_dir = model_dir
            name = ckpt.latest_epoch_checkpoint(model_dir)
        else:
            load_dir, name = model_dir, "best"
        if name:
            state, _ = ckpt.load_checkpoint(load_dir, name, template)
        assert state is not None, "no checkpoint to test"
        test_root = opt.test_root_dir or cfg.data.root_dir
        df = auto_test(solver, state, cfg.data.dataset_name, test_root,
                       save_dir=model_dir, method_name=config_name,
                       crop_hw=(cfg.crop_hw[0], cfg.crop_hw[1]),
                       new_spacing=cfg.data.new_spacing,
                       maximum_batch_size=opt.test_batch_size)
        print(df)


if __name__ == "__main__":
    main()
