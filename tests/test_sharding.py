"""Multi-device sharding tests on the 8-virtual-CPU mesh (SURVEY §2.8):
data-parallel train step compiles + executes with batch sharded over 'data',
and gradients match the single-device result."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxstyle_tpu.parallel import mesh as pmesh
from maxstyle_tpu.solver import TripletSegmentationSolver
from maxstyle_tpu.train_step import make_train_step
from tests.test_train_step import small_config, synthetic_batch


@pytest.fixture(scope="module")
def eight_devices():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return jax.devices()[:8]


class TestMesh:
    def test_make_mesh_shapes(self, eight_devices):
        m = pmesh.make_mesh(8)
        assert m.shape == {"data": 8, "model": 1}
        m2 = pmesh.make_mesh(8, model_parallel=2)
        assert m2.shape == {"data": 4, "model": 2}

    def test_shard_batch_places_on_data_axis(self, eight_devices):
        m = pmesh.make_mesh(8)
        batch = {"image": jnp.zeros((16, 8, 8, 1))}
        sharded = pmesh.shard_batch(batch, m)
        assert len(sharded["image"].sharding.device_set) == 8


class TestDataParallelStep:
    @pytest.mark.slow
    def test_sharded_step_runs_and_is_finite(self, eight_devices):
        cfg = small_config(max_style=True)
        solver = TripletSegmentationSolver(cfg)
        m = pmesh.make_mesh(8)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=16)
        state = pmesh.replicate(state, m)
        step = pmesh.shard_train_step(make_train_step(solver, jit_compile=False), m)
        batch = {
            "image": jnp.clip(jax.random.normal(jax.random.key(1), (16, 32, 32, 1)), 0, 1),
            "label": jax.random.randint(jax.random.key(2), (16, 32, 32), 0, 4),
        }
        batch = pmesh.shard_batch(batch, m)
        rng = pmesh.replicate(jax.random.key(3), m)
        state, metrics = step(state, batch, rng)
        for k, v in metrics.items():
            assert np.isfinite(float(v)), k

    @pytest.mark.slow
    def test_sharded_matches_single_device(self, eight_devices):
        """Same batch, sharded vs unsharded: losses must agree (the mean
        reduction is linear in the batch, so DP is exact)."""
        cfg = small_config()  # standard training only for tight tolerance
        solver = TripletSegmentationSolver(cfg)
        batch = {
            "image": jnp.clip(jax.random.normal(jax.random.key(1), (8, 32, 32, 1)), 0, 1),
            "label": jax.random.randint(jax.random.key(2), (8, 32, 32), 0, 4),
        }
        rng = jax.random.key(3)

        state1 = solver.init_state(jax.random.key(0), (32, 32), batch_size=8)
        step1 = make_train_step(solver)
        _, m_single = step1(state1, batch, rng)

        m = pmesh.make_mesh(8)
        state2 = solver.init_state(jax.random.key(0), (32, 32), batch_size=8)
        state2 = pmesh.replicate(state2, m)
        step2 = pmesh.shard_train_step(make_train_step(solver, jit_compile=False), m)
        _, m_shard = step2(state2, pmesh.shard_batch(batch, m),
                           pmesh.replicate(rng, m))
        np.testing.assert_allclose(float(m_single["loss/standard/total"]),
                                   float(m_shard["loss/standard/total"]),
                                   rtol=2e-4)

    @pytest.mark.slow
    def test_grouped_style_stats_sharded_matches_single_device(
            self, eight_devices):
        """style_group_size under GSPMD data parallelism: the grouped
        MaxStyle step is written at global batch, so sharding must not
        change its losses (group boundaries span device shards here —
        16/8 = 2 per device, G=4 — the worst alignment case)."""
        import dataclasses
        cfg = small_config(max_style=True)
        cfg = dataclasses.replace(
            cfg, max_style=dataclasses.replace(cfg.max_style, n_iter=2,
                                               style_group_size=4))
        solver = TripletSegmentationSolver(cfg)
        batch = {
            "image": jnp.clip(jax.random.normal(jax.random.key(1),
                                                (16, 32, 32, 1)), 0, 1),
            "label": jax.random.randint(jax.random.key(2), (16, 32, 32),
                                        0, 4),
        }
        rng = jax.random.key(3)

        state1 = solver.init_state(jax.random.key(0), (32, 32),
                                   batch_size=16)
        _, m_single = make_train_step(solver)(state1, batch, rng)

        m = pmesh.make_mesh(8)
        state2 = solver.init_state(jax.random.key(0), (32, 32),
                                   batch_size=16)
        state2 = pmesh.replicate(state2, m)
        step2 = pmesh.shard_train_step(
            make_train_step(solver, jit_compile=False), m)
        _, m_shard = step2(state2, pmesh.shard_batch(batch, m),
                           pmesh.replicate(rng, m))
        for k in ("loss/standard/total", "loss/hard/total"):
            if k in m_single:
                np.testing.assert_allclose(float(m_single[k]),
                                           float(m_shard[k]), rtol=5e-4)


class TestShardedLifecycle:
    """Full product loop under one sharded state (VERDICT r3 #5): train N
    steps on the mesh -> orbax save -> restore -> sharded volumetric eval ->
    resume training. Mirrors the reference's train->save_model->
    TestSegmentationNetwork flow (train_adv…:92-584 + :893-959)."""

    @pytest.mark.slow
    def test_train_save_restore_eval_resume(self, eight_devices, tmp_path):
        from maxstyle_tpu.evaluate import TestSegmentationNetwork
        from maxstyle_tpu.utils import checkpoint as ckpt

        cfg = small_config(max_style=True)
        solver = TripletSegmentationSolver(cfg)
        m = pmesh.make_mesh(8)
        state = solver.init_state(jax.random.key(0), (32, 32), batch_size=16)
        state = pmesh.replicate(state, m)
        step = pmesh.shard_train_step(
            make_train_step(solver, jit_compile=False), m, donate_state=False)
        batch = pmesh.shard_batch({
            "image": jnp.clip(jax.random.normal(jax.random.key(1),
                                                (16, 32, 32, 1)), 0, 1),
            "label": jax.random.randint(jax.random.key(2), (16, 32, 32),
                                        0, 4)}, m)
        for i in range(3):
            state, metrics = step(state, batch,
                                  pmesh.replicate(jax.random.key(10 + i), m))
        assert all(np.isfinite(float(v)) for v in metrics.values())

        path = ckpt.save_checkpoint(str(tmp_path), "best", state, epoch=3,
                                    best_score=0.42)
        template = solver.init_state(jax.random.key(0), (32, 32),
                                     batch_size=16)
        restored, meta = ckpt.load_checkpoint(str(tmp_path), "best", template)
        assert meta == {"epoch": 3, "best_score": 0.42, "network_type": ""}
        restored = pmesh.replicate(restored, m)
        # bit-exact round trip of every leaf (params/stats/opt/step)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            state, restored)

        class _DS:
            patient_ids = []

        h = TestSegmentationNetwork(solver, restored, _DS(),
                                    maximum_batch_size=6, crop_hw=(32, 32),
                                    mesh=m)
        vol = np.random.RandomState(0).rand(10, 32, 32).astype(np.float32)
        pred = h.predict_volume(vol)
        assert pred.shape == (10, 32, 32)
        h_single = TestSegmentationNetwork(
            solver, jax.device_get(state), _DS(), maximum_batch_size=6,
            crop_hw=(32, 32))
        np.testing.assert_array_equal(pred, h_single.predict_volume(vol))

        # training resumes from the restored optimizer state
        resumed, rmetrics = step(restored, batch,
                                 pmesh.replicate(jax.random.key(13), m))
        assert all(np.isfinite(float(v)) for v in rmetrics.values())
        assert int(np.asarray(resumed.step)) == int(np.asarray(state.step)) + 1


class TestGraftEntry:
    @pytest.mark.slow
    def test_dryrun_multichip(self, eight_devices):
        import sys
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import dryrun_multichip
        dryrun_multichip(8)

    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        from __graft_entry__ import entry
        fn, args = entry()
        out = jax.jit(fn).lower(*args).compile()
        assert out is not None


class TestShardedInference:
    """SPMD volumetric inference: chunks sharded over 'data', params
    replicated (evaluate.TestSegmentationNetwork mesh=..., infer CLI
    --data_parallel)."""

    def test_sharded_predict_matches_single_device(self, eight_devices):
        from maxstyle_tpu.evaluate import TestSegmentationNetwork
        cfg = small_config()
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)

        class _DS:  # minimal dataset stub (predict_volume only needs chunk)
            patient_ids = []

        m = pmesh.make_mesh(8)
        h_single = TestSegmentationNetwork(solver, state, _DS(),
                                           maximum_batch_size=6,
                                           crop_hw=(64, 64))
        h_shard = TestSegmentationNetwork(solver, state, _DS(),
                                          maximum_batch_size=6,
                                          crop_hw=(64, 64), mesh=m)
        # chunk rounded up to a multiple of the data-axis size
        assert h_shard.chunk == 8
        vol = np.random.RandomState(0).rand(10, 64, 64).astype(np.float32)
        a = h_single.predict_volume(vol)
        b = h_shard.predict_volume(vol)
        assert a.shape == b.shape == (10, 64, 64)
        # identical predictions (same params, same math, only placement
        # differs; CPU mesh is deterministic)
        np.testing.assert_array_equal(a, b)


class TestTensorParallelViT:
    """Megatron-style TP for the UNETR ViT over the 'model' axis
    (parallel/tp.py): sharded == replicated output."""

    def test_vit_tp_matches_replicated(self, eight_devices):
        import numpy as np
        from maxstyle_tpu.models.unetr import ViT
        from maxstyle_tpu.parallel import tp

        vit = ViT(img_size=32, patch_size=16, hidden_size=48, mlp_dim=96,
                  num_layers=2, num_heads=4)
        x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 1),
                        jnp.float32)
        v = vit.init(jax.random.key(0), x, train=False)
        ref_final, ref_hidden = jax.jit(
            lambda p, xx: vit.apply(p, xx, train=False))(v, x)

        # data=2 x model=4 mesh; 3*heads=12 % 4 == 0 -> head-aligned split
        m = pmesh.make_mesh(8, model_parallel=4)
        shardings = tp.vit_tp_shardings(v, m)
        # the rules actually hit the transformer leaves
        specs = jax.tree_util.tree_leaves(
            shardings, is_leaf=lambda s: isinstance(s, jax.sharding.NamedSharding))
        assert any(s.spec != jax.sharding.PartitionSpec() for s in specs)

        v_tp = tp.shard_vit_params(v, m)
        with jax.sharding.use_mesh(m) if hasattr(jax.sharding, "use_mesh") \
                else m:
            out_final, out_hidden = jax.jit(
                lambda p, xx: vit.apply(p, xx, train=False))(v_tp, x)
        np.testing.assert_allclose(np.asarray(out_final),
                                   np.asarray(ref_final), rtol=2e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out_hidden[-1]),
                                   np.asarray(ref_hidden[-1]),
                                   rtol=2e-5, atol=1e-5)


class TestShardedAugmentation:
    """shard_map'd augmentation (augment_batch_sharded): the pallas warp has
    no GSPMD partitioning rule, so the DP fused step wraps the augmentation
    in a shard_map over 'data' — output must stay batch-sharded and shards
    must draw independent augmentations."""

    def test_output_sharded_and_shards_independent(self, eight_devices):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from maxstyle_tpu.data import augment as A

        m = pmesh.make_mesh(8)
        pol = A.get_policy("ACDC_affine_elastic_intensity", (48, 48), (32, 32))
        raw = jnp.asarray(np.random.RandomState(0).rand(8, 48, 48), jnp.float32)
        lab = jnp.zeros((8, 48, 48), jnp.int32)
        f = jax.jit(lambda k, i, l: A.augment_batch_sharded(k, i, l, pol, m),
                    in_shardings=(NamedSharding(m, P()),
                                  NamedSharding(m, P("data")),
                                  NamedSharding(m, P("data"))))
        img, out_lab = f(jax.random.key(0), raw, lab)
        assert img.sharding.spec == P("data"), img.sharding.spec
        a = np.asarray(img)
        assert np.isfinite(a).all() and a.shape == (8, 32, 32, 1)
        # per-shard key folding: different shards, different augmentations
        assert np.abs(a[0] - a[1]).max() > 1e-4


class TestTensorParallelTraining:
    """TP TRAINING (VERDICT r2 #4): params + optimizer state sharded by the
    Megatron specs over the 'model' axis (parallel/tp.py), one-step loss and
    updated-parameter equality vs the replicated execution."""

    def _vit_setup(self):
        import optax
        from maxstyle_tpu.models.unetr import ViT

        vit = ViT(img_size=32, patch_size=16, hidden_size=48, mlp_dim=96,
                  num_layers=2, num_heads=4)
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.rand(4, 32, 32, 1), jnp.float32)
        target = jnp.asarray(rng.rand(4, 4, 48), jnp.float32)
        v = vit.init(jax.random.key(0), x, train=False)
        tx = optax.adam(1e-3)
        bundle = {"params": v["params"], "opt": tx.init(v["params"]),
                  "step": jnp.zeros((), jnp.int32)}

        def step_fn(bundle, batch, _rng):
            def loss_fn(p):
                out, _ = vit.apply({"params": p}, batch["x"], train=False)
                return jnp.mean((out - batch["y"]) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(bundle["params"])
            updates, opt = tx.update(grads, bundle["opt"], bundle["params"])
            return ({"params": optax.apply_updates(bundle["params"], updates),
                     "opt": opt, "step": bundle["step"] + 1},
                    {"loss": loss})

        return vit, bundle, step_fn, {"x": x, "y": target}

    def test_tp_train_step_matches_replicated(self, eight_devices):
        from maxstyle_tpu.parallel import tp

        vit, bundle, step_fn, batch = self._vit_setup()
        ref_bundle, ref_metrics = jax.jit(step_fn)(
            bundle, batch, jax.random.key(1))

        m = pmesh.make_mesh(8, model_parallel=4)  # heads=4 % mp=4 == 0
        shardings = tp.train_state_tp_shardings(bundle, m)
        b_tp = jax.device_put(bundle, shardings)
        # params AND adam moments are actually split over 'model'
        qkv = b_tp["params"]["block0"]["attn"]["qkv"]["kernel"]
        assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")
        mu_qkv = jax.tree_util.tree_leaves(
            jax.tree_util.tree_map_with_path(
                lambda p, l: l if any(
                    getattr(k, "key", None) == "qkv" for k in p) else None,
                b_tp["opt"][0].mu, is_leaf=lambda l: l is None))
        assert any(x.sharding.spec != jax.sharding.PartitionSpec()
                   for x in mu_qkv if x is not None)

        step_tp = tp.shard_tp_train_step(step_fn, shardings, m,
                                         donate_state=False)
        out_bundle, metrics = step_tp(b_tp, batch, jax.random.key(1))
        np.testing.assert_allclose(float(metrics["loss"]),
                                   float(ref_metrics["loss"]),
                                   rtol=1e-5, atol=1e-6)
        # updated params identical to the replicated update
        flat_ref = jax.tree_util.tree_leaves(ref_bundle["params"])
        flat_tp = jax.tree_util.tree_leaves(out_bundle["params"])
        for a, b in zip(flat_ref, flat_tp):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=2e-5, atol=1e-6)
        # updated params keep the TP placement (no silent re-replication)
        qkv2 = out_bundle["params"]["block0"]["attn"]["qkv"]["kernel"]
        assert qkv2.sharding.spec == jax.sharding.PartitionSpec(None, "model")

    @pytest.mark.slow
    def test_solver_tp_train_step_unetr(self, eight_devices):
        """FULL UnetTransformer solver train step on the 2D (data x model)
        mesh: ViT trunk + its Adam moments sharded, loss equal to the
        replicated execution."""
        from maxstyle_tpu.parallel import tp
        from tests.test_unet_variants import with_network

        cfg = with_network(small_config(), "UnetTransformer_16")
        solver = TripletSegmentationSolver(cfg)
        state = solver.init_state(jax.random.key(0), (64, 64), batch_size=4)
        raw_step = make_train_step(solver, jit_compile=False)
        batch = synthetic_batch(jax.random.key(1))

        _, ref_metrics = jax.jit(raw_step)(state, batch, jax.random.key(2))

        m = pmesh.make_mesh(8, model_parallel=4)  # 12 heads % 4 == 0
        shardings = tp.train_state_tp_shardings(state, m)
        st_tp = jax.device_put(state, shardings)
        qkv = (st_tp.params["image_encoder"]["vit"]["block0"]["attn"]["qkv"]
               ["kernel"])
        assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")
        step_tp = tp.shard_tp_train_step(raw_step, shardings, m,
                                         donate_state=False)
        st2, metrics = step_tp(st_tp, batch, jax.random.key(2))
        np.testing.assert_allclose(float(metrics["loss/total"]),
                                   float(ref_metrics["loss/total"]),
                                   rtol=5e-5, atol=1e-5)
        assert all(np.isfinite(float(v)) for v in metrics.values())
