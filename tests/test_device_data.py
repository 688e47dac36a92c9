"""Device-resident dataset training tests."""

import jax
import jax.numpy as jnp
import numpy as np

from maxstyle_tpu.data import augment as A
from maxstyle_tpu.data.device_data import (DeviceDataset,
                                           make_device_train_loop,
                                           train_device_resident)
from maxstyle_tpu.solver import TripletSegmentationSolver
from tests.test_train_step import small_config
import pytest

pytestmark = pytest.mark.slow  # heavy compile; excluded from `make test-fast`


def make_dataset(n=16, pad=64):
    key = jax.random.key(0)
    img = jax.nn.sigmoid(jax.random.normal(key, (n, pad, pad)))
    lab = (img * 4).astype(jnp.int32) % 4
    return DeviceDataset(img, lab)


class TestDeviceResident:
    def test_loop_runs_and_updates(self):
        cfg = small_config()
        solver = TripletSegmentationSolver(cfg)
        ds = make_dataset()
        policy = A.get_policy("no_aug", (64, 64), (64, 64))
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        before = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        run = make_device_train_loop(solver, policy, keep_orig=True,
                                     half_batch=2, steps_per_call=4)
        state, metrics = run(state, ds.images, ds.labels, jax.random.key(1))
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k
        after = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        assert np.abs(after - before).max() > 0

    def test_driver_decreases_loss(self):
        cfg = small_config()
        solver = TripletSegmentationSolver(cfg)
        ds = make_dataset()
        policy = A.get_policy("no_aug", (64, 64), (64, 64))
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        hist = []
        state, metrics = train_device_resident(
            solver, state, ds, policy, keep_orig=True, half_batch=2,
            total_steps=24, rng=jax.random.key(3), steps_per_call=8,
            log_fn=lambda c, m: hist.append(float(m["loss/standard/total"])))
        assert hist[-1] < hist[0]

    def test_from_slice_dataset(self, tmp_path):
        from maxstyle_tpu.data.datasets import build_general_dataset
        from tests.test_data import make_synthetic_site
        root = make_synthetic_site(str(tmp_path / "s"), n_patients=2,
                                   shape=(3, 40, 40))
        sds = build_general_dataset(root, "{pid}/img.nii.gz",
                                    "{pid}/seg.nii.gz", pad_hw=(40, 40),
                                    crop_hw=(32, 32))
        dds = DeviceDataset.from_slice_dataset(sds)
        assert len(dds) == len(sds)
        assert dds.images.shape[1:] == (40, 40)
        # the native bulk-pack path must agree with the per-slice loop
        import numpy as np
        for i in range(len(sds)):
            img, lab, _ = sds.get_raw_slice(i)
            np.testing.assert_array_equal(np.asarray(dds.images[i]), img)
            np.testing.assert_array_equal(np.asarray(dds.labels[i]), lab)
