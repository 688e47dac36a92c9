"""Infra-surface parity against the reference's OWN executable code:
CV split policies, runningScore, LR schedules, EMA warmup."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from maxstyle_tpu import metrics as our_metrics  # noqa: E402
from maxstyle_tpu.data import splits as our_splits  # noqa: E402
from maxstyle_tpu.utils.ema import ema_init, ema_update, make_lr_schedule  # noqa: E402

pytestmark = pytest.mark.slow


class TestSplitPolicies:
    """data/splits.py vs dataset_loader/ACDC_few_shot_cv_settings.py —
    identical patient lists for every published setting/cval."""

    @pytest.fixture(scope="class")
    def ref(self):
        from tests.reference_shim import reference_module
        return reference_module(
            "src.dataset_loader.ACDC_few_shot_cv_settings")

    @pytest.mark.parametrize("identifier", ["standard", "one_shot",
                                            "three_shot", "10", "0.1", "1.0"])
    @pytest.mark.parametrize("cval", [0, 1, 2])
    def test_acdc_lists_match(self, ref, identifier, cval):
        theirs = ref.get_ACDC_split_policy(identifier, cval)
        ours = our_splits.acdc_split(identifier, cval)
        for key in ("train", "validate", "test", "unlabelled"):
            assert list(ours[key]) == list(theirs[key]), (identifier, cval,
                                                          key)

    @pytest.mark.parametrize("identifier", ["one_shot", "three_shot",
                                            "five_shot", "15_shot", "full"])
    @pytest.mark.parametrize("cval", [0, 1])
    def test_ukbb_lists_match(self, ref, identifier, cval):
        theirs = ref.get_UKBB_split_policy(identifier, cval)
        ours = our_splits.ukbb_split(identifier, cval)
        for key in ("train", "validate", "test"):
            assert list(ours[key]) == list(theirs[key]), key


class TestRunningScore:
    def test_scores_match(self):
        from tests.reference_shim import reference_module
        ref_metrics = reference_module("src.common_utils.metrics")
        rng = np.random.RandomState(0)
        gts = rng.randint(0, 4, (6, 24, 24))
        preds = np.where(rng.rand(6, 24, 24) < 0.7, gts,
                         rng.randint(0, 4, (6, 24, 24)))
        theirs = ref_metrics.runningScore(4)
        ours = our_metrics.RunningScore(4)
        theirs.update(gts, preds)
        ours.update(gts, preds)
        ref_scores, ref_cls = theirs.get_scores()
        our_scores = ours.get_scores()
        for k, v in ref_scores.items():
            assert our_scores[k] == pytest.approx(v), k
        for c, v in ref_cls.items():
            assert our_scores["class_iou"][c] == pytest.approx(v), c
        np.testing.assert_array_equal(ours.confusion_matrix,
                                      theirs.confusion_matrix)


class TestSchedules:
    @pytest.mark.parametrize("policy,gamma", [("step", 0.5), ("step2", 0.1)])
    def test_step_lr_sequence_matches_torch(self, policy, gamma):
        """Our piecewise schedule reproduces torch StepLR(step_size=5)
        epoch-for-epoch (model_util.get_scheduler:684-687)."""
        base = 0.01
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=base)
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=5,
                                                gamma=gamma)
        ours = make_lr_schedule(policy, base, lr_decay_epochs=5,
                                steps_per_epoch=1, total_epochs=30)
        for epoch in range(30):
            torch_lr = opt.param_groups[0]["lr"]
            assert float(ours(epoch)) == pytest.approx(torch_lr), epoch
            opt.step()
            sched.step()

    def test_step_warmstart_matches_reference_lambda(self):
        from tests.reference_shim import reference_module
        mu = reference_module("src.models.model_util")
        base = 0.1
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=base)
        sched = mu.get_scheduler(opt, "step_warmstart")
        ours = make_lr_schedule("step_warmstart", base, steps_per_epoch=1)
        for epoch in range(0, 250, 7):
            # LambdaLR computes lr = base * lambda(epoch) directly
            sched.last_epoch = epoch - 1
            sched.step()
            torch_lr = opt.param_groups[0]["lr"]
            assert float(ours(epoch)) == pytest.approx(torch_lr), epoch


class TestEMA:
    def test_warmup_matches_reference(self):
        from tests.reference_shim import reference_module
        mu = reference_module("src.models.model_util")
        rng = np.random.RandomState(0)
        w0 = rng.randn(4, 3).astype(np.float32)
        p = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        ref_ema = mu.ExponentialMovingAverage([p], decay=0.999,
                                              use_num_updates=True)
        ours = ema_init({"w": jnp.asarray(w0)})
        for n in range(1, 8):
            with torch.no_grad():
                p -= 0.05 * (n + 1)
            ref_ema.update([p])
            ours = ema_update(ours, {"w": jnp.asarray(p.detach().numpy())},
                              decay=0.999, num_updates=n)
            np.testing.assert_allclose(
                np.asarray(ours["w"]), ref_ema.shadow_params[0].numpy(),
                rtol=1e-6, atol=1e-7, err_msg=f"update {n}")
