"""Executable parity for the reference's base `SegmentationModel` solver.

base_segmentation_model.py:24-331 is the reference's plain supervised
baseline solver (our `maxstyle_tpu/basic_solver.py`). It is DEAD CODE in the
reference as shipped:

* `__init__` never calls `super().__init__()` (:45-49), so constructing it
  raises "cannot assign module before Module.__init__() call" at :56;
* the UNet zoo branches pass `self_attention=...` (:84-118) which
  `segmentation_models.unet.UNet.__init__` (unet.py:458) does not accept;
* `get_loss` (:185-191) calls `self.basic_loss_fn`, never bound on the class
  (it is a module function in custom_loss.py:13), and its default
  `loss_type='cross_entropy'` misses basic_loss_fn's `'cross entropy'`
  dispatch key, raising NotImplementedError;
* no reference driver instantiates it (train_adv… uses only the triplet
  solver).

These tests (a) pin the dead-code findings so MIGRATION.md stays honest, and
(b) resurrect the class — `__new__` + external `nn.Module.__init__` — to run
its FCN_16 branch for real and pin our basic_solver against the reference's
own forward / loss / Adam step / EMA teacher / evaluate() execution.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import os  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu import basic_solver  # noqa: E402
from maxstyle_tpu.metrics import RunningScore  # noqa: E402
from maxstyle_tpu.utils import torch_import as ti  # noqa: E402

pytestmark = pytest.mark.slow

needs_reference = pytest.mark.skipif(
    not os.path.isdir("/root/reference/src"), reason="reference unavailable")

HW = 64
B = 4
NUM_CLASSES = 4
LR = 1e-3


def ref_base_solver(network_type="FCN_16", **kw):
    """Construct the reference solver around its missing super().__init__."""
    from tests.reference_shim import reference_module
    import torch.nn as nn
    mod = reference_module("src.models.base_segmentation_model")
    obj = mod.SegmentationModel.__new__(mod.SegmentationModel)
    nn.Module.__init__(obj)  # the line :45-49 forgot
    mod.SegmentationModel.__init__(
        obj, network_type=network_type, num_classes=NUM_CLASSES,
        use_gpu=False, lr=LR, **kw)
    # bind the loss fn get_loss expects but the class never defines (:187)
    from src.models.custom_loss import basic_loss_fn
    obj.basic_loss_fn = basic_loss_fn
    return obj


def fixed_batch(seed=0):
    rng = np.random.RandomState(seed)
    x = rng.rand(B, 1, HW, HW).astype(np.float32)
    y = (x[:, 0] * NUM_CLASSES).astype(np.int64) % NUM_CLASSES
    return x, y


def build_pair(use_ema=False):
    torch.manual_seed(0)
    ref = ref_base_solver(use_ema=use_ema)
    ref.train()
    ours = basic_solver.SegmentationModel(
        network_type="FCN_16", num_classes=NUM_CLASSES, lr=LR,
        use_ema=use_ema)
    state = ours.init_state(jax.random.PRNGKey(0), (HW, HW), batch_size=B)
    params, stats = ti.convert_fcn(
        {k: v.detach().numpy().copy() for k, v in ref.model.state_dict().items()})
    state = state.replace(
        params=params, batch_stats=stats,
        opt_state=ours.tx.init(params),
        ema_params=(jax.tree_util.tree_map(np.copy, params)
                    if use_ema else None))
    return ref, ours, state


def _flat_delta(before, after):
    leaves_b = jax.tree_util.tree_leaves(before)
    leaves_a = jax.tree_util.tree_leaves(after)
    return np.concatenate([
        (np.asarray(a, np.float64) - np.asarray(b, np.float64)).ravel()
        for b, a in zip(leaves_b, leaves_a)])


def tree_max_abs_diff(a, b):
    leaves_a = jax.tree_util.tree_leaves(a)
    leaves_b = jax.tree_util.tree_leaves(b)
    assert len(leaves_a) == len(leaves_b)
    return max(float(np.max(np.abs(np.asarray(x) - np.asarray(y))))
               for x, y in zip(leaves_a, leaves_b))


@needs_reference
class TestDeadCode:
    """The reference base solver cannot run as shipped — pin each failure."""

    def test_direct_construction_crashes(self):
        from tests.reference_shim import reference_module
        mod = reference_module("src.models.base_segmentation_model")
        with pytest.raises(AttributeError, match="Module.__init__"):
            mod.SegmentationModel(network_type="FCN_16",
                                  num_classes=NUM_CLASSES, use_gpu=False)

    def test_unet_branch_crashes(self):
        # :84-89 passes self_attention=..., UNet.__init__ (unet.py:458) has
        # no such parameter
        with pytest.raises(TypeError, match="self_attention"):
            ref_base_solver(network_type="UNet_16")

    def test_get_loss_default_dispatch_crashes(self):
        ref = ref_base_solver()
        pred = torch.zeros(1, NUM_CLASSES, 4, 4)
        tgt = torch.zeros(1, 4, 4, dtype=torch.long)
        with pytest.raises(NotImplementedError):
            # default loss_type='cross_entropy' (:185) != basic_loss_fn's
            # 'cross entropy' key (custom_loss.py:23)
            ref.get_loss(pred, targets=tgt)


@needs_reference
class TestBaseSolverExecutable:
    def test_forward_predict_and_loss(self):
        ref, ours, state = build_pair()
        x, y = fixed_batch()
        tx = torch.from_numpy(x)

        # train-mode forward (batch-stat BN)
        ref.train()
        ref_logits = ref.forward(tx).detach().numpy()
        our_logits = np.asarray(ours.network.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=True,
            mutable=["batch_stats"])[0])
        np.testing.assert_allclose(
            np.transpose(our_logits, (0, 3, 1, 2)), ref_logits,
            atol=2e-4, rtol=1e-4)

        # loss through the reference's own (re-bound) get_loss path
        ref_loss = float(ref.get_loss(
            ref.forward(tx), targets=torch.from_numpy(y),
            loss_type="cross entropy").detach())
        from maxstyle_tpu import losses
        our_loss = float(losses.cross_entropy_2d(
            jnp.asarray(our_logits), jnp.asarray(y)))
        assert abs(our_loss - ref_loss) < 5e-5

        # eval-mode predict(softmax=True) (:240-247). The two train-mode
        # forwards above mutated the torch BN running stats in place —
        # re-import them so both sides normalize with the same statistics.
        _, stats_now = ti.convert_fcn(
            {k: v.detach().numpy().copy()
             for k, v in ref.model.state_dict().items()})
        state = state.replace(batch_stats=stats_now)
        ref_probs = ref.predict(tx, softmax=True).numpy()
        our_probs = np.asarray(ours.predict(
            state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), softmax=True))
        np.testing.assert_allclose(
            np.transpose(our_probs, (0, 3, 1, 2)), ref_probs,
            atol=1e-5, rtol=1e-4)

    def test_adam_step_and_ema_parity(self):
        """One full supervised update: loss -> backward -> Adam(1e-3) ->
        EMA warmup update (:193-204, 226-236), then compare EVERY post-step
        weight, BN running stat and EMA shadow."""
        ref, ours, state = build_pair(use_ema=True)
        x, y = fixed_batch()

        ref.train()
        pred = ref.forward(torch.from_numpy(x))
        loss = ref.get_loss(pred, targets=torch.from_numpy(y),
                            loss_type="cross entropy")
        ref.reset_optimizers()
        loss.backward()
        ref.optimize_params()  # optimizer.step() + ema.update (:226-230)

        step = ours.make_train_step()
        new_state, logs = step(
            state, {"image": jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
                    "label": jnp.asarray(y)}, jax.random.PRNGKey(1))
        assert abs(float(logs["loss"]) - float(loss.detach())) < 5e-5

        ref_params, ref_stats = ti.convert_fcn(
            {k: v.detach().numpy().copy()
             for k, v in ref.model.state_dict().items()})
        # BN running stats carry no optimizer noise — compare tight
        assert tree_max_abs_diff(new_state.batch_stats, ref_stats) < 5e-5

        # Weight-update parity. The FIRST Adam step is ~lr*sign(g)
        # elementwise; conv biases feeding straight into BatchNorm have
        # mathematically-zero gradients, so their float-noise sign can flip
        # between frameworks (|diff| <= 2*lr). Real bugs decorrelate the
        # whole update direction instead: bound every element AND require
        # global cosine alignment (same contract as TestFullTrainStep).
        assert tree_max_abs_diff(new_state.params, ref_params) <= 2 * LR * 1.05
        our_d = _flat_delta(state.params, new_state.params)
        ref_d = _flat_delta(state.params, ref_params)
        cos = float(np.dot(our_d, ref_d) /
                    (np.linalg.norm(our_d) * np.linalg.norm(ref_d) + 1e-12))
        assert cos > 0.98, f"update cosine {cos:.4f}"

        # EMA teacher (:193-204): get_teacher_model copies the shadow params
        # into the network — convert that state_dict and compare trees.
        # shadow = init - (1-d)*(init - new) with warmup d = 2/11 at the
        # first update, so the Adam sign-flip bound scales by (1-d).
        ref.get_teacher_model()
        teacher, _ = ti.convert_fcn(
            {k: v.detach().numpy().copy()
             for k, v in ref.model.state_dict().items()})
        one_minus_d = 1.0 - 2.0 / 11.0
        assert (tree_max_abs_diff(new_state.ema_params, teacher)
                <= one_minus_d * 2 * LR * 1.05)
        our_ed = _flat_delta(state.params, new_state.ema_params)
        ref_ed = _flat_delta(state.params, teacher)
        ecos = float(np.dot(our_ed, ref_ed) /
                     (np.linalg.norm(our_ed) * np.linalg.norm(ref_ed) + 1e-12))
        assert ecos > 0.98, f"EMA shadow cosine {ecos:.4f}"

        # get_student_model must restore the optimized weights exactly
        ref.get_student_model()
        restored, _ = ti.convert_fcn(
            {k: v.detach().numpy().copy()
             for k, v in ref.model.state_dict().items()})
        assert tree_max_abs_diff(ref_params, restored) < 1e-7

    def test_evaluate_running_score(self):
        """evaluate() end-to-end (:249-268): argmax maps and the streaming
        confusion matrix must agree exactly."""
        ref, ours, state = build_pair()
        x, y = fixed_batch(seed=3)
        pred_npy = ref.evaluate(torch.from_numpy(x), y)

        probs = ours.predict(
            state, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), softmax=True)
        our_pred = np.asarray(jnp.argmax(probs, axis=-1))
        np.testing.assert_array_equal(our_pred, pred_npy)

        score = RunningScore(NUM_CLASSES)
        score.update(y, our_pred)
        np.testing.assert_allclose(score.confusion_matrix,
                                   ref.running_metric.confusion_matrix)
        # the scalar scores the reference reports (metrics.py:29-49) — our
        # keys replicate the reference's verbatim (tab suffixes included)
        ref_scores, ref_cls_iu = ref.running_metric.get_scores()
        our_scores = score.get_scores()
        for rk, rv in ref_scores.items():
            np.testing.assert_allclose(float(our_scores[rk]), float(rv),
                                       err_msg=rk)
        for cls, iu in ref_cls_iu.items():
            np.testing.assert_allclose(float(our_scores["class_iou"][cls]),
                                       float(iu), equal_nan=True)
