"""TensorBoard event-file writer (utils/tb_events.py) — the reference's
observability contract is TB scalar files (train_adv…:130-131,538-541)."""

import glob
import os

import numpy as np
import pytest

from maxstyle_tpu.utils import tb_events as tbe


class TestCrc32c:
    def test_known_vectors(self):
        # RFC 3720 test vectors
        assert tbe.crc32c(b"") == 0
        assert tbe.crc32c(b"123456789") == 0xE3069283
        assert tbe.crc32c(bytes(32)) == 0x8A9136AA

    def test_mask_roundtrip_is_stable(self):
        data = b"some payload"
        assert tbe.masked_crc32c(data) == tbe.masked_crc32c(data)


class TestEventFileRoundTrip:
    def test_write_and_read_back(self, tmp_path):
        w = tbe.EventFileWriter(str(tmp_path))
        w.add_scalars({"loss/standard/total": 1.5, "iou/val_iou": 0.75}, 3)
        w.add_scalar("loss/hard/total", 2.25, 4)
        w.close()

        events = tbe.read_events(w.path)
        assert events[0]["file_version"] == "brain.Event:2"
        assert events[1]["step"] == 3
        assert events[1]["scalars"]["loss/standard/total"] == pytest.approx(1.5)
        assert events[1]["scalars"]["iou/val_iou"] == pytest.approx(0.75)
        assert events[2]["step"] == 4
        assert events[2]["scalars"]["loss/hard/total"] == pytest.approx(2.25)

    def test_readable_by_tensorboard_loader(self, tmp_path):
        """Cross-check the wire format against an independent reader
        (tensorboard's own record/proto parser when installed)."""
        pytest.importorskip("tensorboard")
        from tensorboard.backend.event_processing.event_file_loader import (
            EventFileLoader)
        w = tbe.EventFileWriter(str(tmp_path))
        w.add_scalars({"loss/standard/seg": 0.5}, 7)
        w.close()
        events = list(EventFileLoader(w.path).Load())
        assert events[0].file_version == "brain.Event:2"
        assert events[1].step == 7
        v = events[1].summary.value[0]
        assert v.tag == "loss/standard/seg"
        # modern TB loaders migrate simple_value -> tensor(float_val)
        got = (v.tensor.float_val[0] if v.tensor.float_val
               else v.simple_value)
        assert got == pytest.approx(0.5)
        assert v.metadata.data_class == 1  # DATA_CLASS_SCALAR


class TestScalarLoggerIntegration:
    def test_logger_writes_event_file(self, tmp_path):
        import jax.numpy as jnp

        from maxstyle_tpu.train import ScalarLogger
        lg = ScalarLogger(str(tmp_path), enabled=True)
        lg.log_step({"loss/total": jnp.asarray(2.0)})
        lg.log_step({"loss/total": jnp.asarray(4.0)})
        lg.log_epoch(0, val_iou=0.5, val_acc=0.9)
        lg.export("scalars")
        lg.close()

        files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
        assert len(files) == 1
        events = tbe.read_events(files[0])
        by_step = {e["step"]: e["scalars"] for e in events if e["scalars"]}
        np.testing.assert_allclose(by_step[0]["loss/total"], 3.0)  # cum. avg
        np.testing.assert_allclose(by_step[0]["iou/val_iou"], 0.5)
        assert os.path.exists(os.path.join(str(tmp_path), "scalars.json"))
