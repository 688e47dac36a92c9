"""Batch inference / serving CLI.

Deployment surface: load a checkpoint (orbax or imported reference .pth),
segment every volume under a directory, write NRRD predictions (+ optional
entropy uncertainty maps), one compiled program per chunk shape.

Usage:
  python -m maxstyle_tpu.infer --ckpt_dir saved/.../model --ckpt best \
      --input_dir data/site --image_format "{pid}/img.nii.gz" \
      --out_dir predictions [--uncertainty] [--keep_largest_cc]
"""

from __future__ import annotations

import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def main(argv=None):
    from maxstyle_tpu.config import ExperimentConfig
    from maxstyle_tpu.data import medio
    from maxstyle_tpu.data.datasets import SliceDataset
    from maxstyle_tpu.solver import TripletSegmentationSolver
    from maxstyle_tpu.utils import checkpoint as ckpt
    from maxstyle_tpu.utils.postprocess import keep_largest_connected_components
    from maxstyle_tpu.utils.uncertainty import entropy_map

    parser = argparse.ArgumentParser()
    parser.add_argument("--json_config_path", type=str, default=None,
                        help="experiment config (defaults to the flagship)")
    parser.add_argument("--ckpt_dir", type=str, default=None)
    parser.add_argument("--ckpt", type=str, default="best")
    parser.add_argument("--torch_ckpt_dir", type=str, default=None)
    parser.add_argument("--input_dir", type=str, required=True)
    parser.add_argument("--image_format", type=str, default="{pid}/img.nii.gz")
    parser.add_argument("--label_format", type=str, default=None,
                        help="optional labels: report Dice when provided")
    parser.add_argument("--out_dir", type=str, required=True)
    parser.add_argument("--chunk", type=int, default=25)
    parser.add_argument("--crop", type=int, nargs=2, default=None)
    parser.add_argument("--uncertainty", action="store_true")
    parser.add_argument("--keep_largest_cc", action="store_true")
    parser.add_argument("--data_parallel", action="store_true",
                        help="shard slice chunks over all devices (SPMD "
                             "batch parallelism; params replicated)")
    opt = parser.parse_args(argv)

    if opt.json_config_path:
        cfg = ExperimentConfig.from_json(opt.json_config_path)
    else:
        cfg = ExperimentConfig()
    solver = TripletSegmentationSolver(cfg)
    crop_hw = tuple(opt.crop) if opt.crop else cfg.crop_hw

    state = solver.init_state(jax.random.key(0), crop_hw, batch_size=2)
    if opt.ckpt_dir:
        state, _ = ckpt.load_checkpoint(opt.ckpt_dir, opt.ckpt, state)
    elif opt.torch_ckpt_dir:
        from maxstyle_tpu.utils.torch_import import import_module_checkpoint
        new_p, new_s = dict(state.params), dict(state.batch_stats)
        for name in state.params:
            path = os.path.join(opt.torch_ckpt_dir, f"{name}.pth")
            if os.path.exists(path):
                p, s = import_module_checkpoint(path, name, solver.spec)
                new_p[name] = jax.tree_util.tree_map(jnp.asarray, p)
                new_s[name] = jax.tree_util.tree_map(jnp.asarray, s)
        state = state.replace(params=new_p, batch_stats=new_s)

    label_format = opt.label_format or opt.image_format  # labels optional
    ds = SliceDataset(opt.input_dir,
                      sorted(os.listdir(opt.input_dir)),
                      opt.image_format, label_format,
                      pad_hw=crop_hw, crop_hw=crop_hw,
                      ignore_black_slice=False)

    def _predict_impl(params, stats, x):
        return solver.predict(params, stats, x, softmax=True,
                              normalize_input=False)

    if opt.data_parallel and len(jax.devices()) > 1:
        from maxstyle_tpu.parallel import mesh as pm
        mesh = pm.make_mesh()
        n_data = mesh.shape[pm.DATA_AXIS]
        opt.chunk = -(-opt.chunk // n_data) * n_data
        predict_logits = jax.jit(
            _predict_impl,
            in_shardings=(pm.replicated(mesh), pm.replicated(mesh),
                          pm.batch_sharding(mesh)),
            out_shardings=pm.batch_sharding(mesh))
        print(f"data-parallel inference over {n_data} devices, "
              f"chunk {opt.chunk}")
    else:
        predict_logits = jax.jit(_predict_impl)

    os.makedirs(opt.out_dir, exist_ok=True)
    t0 = time.time()
    n_slices = 0
    for pid in ds.patient_ids:
        vol, _, spacing = ds.get_patient_volume(pid)
        s = vol.shape[0]
        probs_parts = []
        for start in range(0, s, opt.chunk):
            part = vol[start:start + opt.chunk]
            n = part.shape[0]
            if n < opt.chunk:
                part = np.concatenate(
                    [part, np.zeros((opt.chunk - n, *part.shape[1:]),
                                    part.dtype)], 0)
            probs = predict_logits(state.params, state.batch_stats,
                                   jnp.asarray(part[..., None]))
            probs_parts.append(np.asarray(probs)[:n])
        probs = np.concatenate(probs_parts, 0)
        pred = probs.argmax(-1).astype(np.uint8)
        if opt.keep_largest_cc:
            pred = keep_largest_connected_components(pred).astype(np.uint8)
        medio.write_nrrd(os.path.join(opt.out_dir, f"{pid}_pred.nrrd"), pred,
                         spacing=spacing)
        if opt.uncertainty:
            ent = np.asarray(entropy_map(jnp.log(jnp.clip(probs, 1e-8, 1.0))))
            medio.write_nrrd(os.path.join(opt.out_dir, f"{pid}_entropy.nrrd"),
                             ent.astype(np.float32), spacing=spacing)
        n_slices += s
        print(f"{pid}: {s} slices")
    dt = time.time() - t0
    print(f"segmented {len(ds.patient_ids)} volumes ({n_slices} slices) "
          f"in {dt:.2f}s ({n_slices / dt:.1f} slices/s)")


if __name__ == "__main__":
    main()
