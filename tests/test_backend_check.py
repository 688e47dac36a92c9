import jax
import pytest

from maxstyle_tpu.utils import backend as B


def test_backend():
    print("BACKEND:", jax.default_backend(), jax.devices())
    assert jax.default_backend() == "cpu"


class TestTunnelHardening:
    """bench.py/__graft_entry__ must survive both observed tunnel failure
    modes: init exception (round 3 artifact) and init hang (round 4)."""

    def test_probe_succeeds_on_cpu(self):
        # pin the child to plain CPU (drop the TPU-tunnel plugin: on this
        # host it is injected via PYTHONPATH sitecustomize and silently
        # overrides JAX_PLATFORMS=cpu)
        import os
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PYTHONPATH", None)
        ok, detail = B.probe_backend(timeout_s=300.0, env=env)
        assert ok, detail
        assert detail.startswith("cpu")

    def test_probe_times_out_on_hang(self, monkeypatch, tmp_path):
        # a hanging child must come back as a bounded failure, not block
        hang = tmp_path / "hang.sh"
        hang.write_text("#!/bin/sh\nsleep 60\n")
        hang.chmod(0o755)
        monkeypatch.setattr(B.sys, "executable", str(hang))
        ok, detail = B.probe_backend(timeout_s=0.2)
        assert not ok and "hung" in detail

    def test_wait_retries_then_raises(self, monkeypatch):
        calls = []
        monkeypatch.setattr(B, "probe_backend",
                            lambda timeout_s: (calls.append(1) or
                                               (False, "UNAVAILABLE")))
        monkeypatch.setattr(B.time, "sleep", lambda s: None)
        with pytest.raises(RuntimeError, match="environment failure"):
            B.wait_for_backend(max_attempts=3, respect_pin=False)
        assert len(calls) == 3

    def test_wait_recovers_mid_way(self, monkeypatch):
        seq = iter([(False, "hang"), (True, "cpu 1")])
        monkeypatch.setattr(B, "probe_backend", lambda timeout_s: next(seq))
        monkeypatch.setattr(B.time, "sleep", lambda s: None)
        B.wait_for_backend(max_attempts=3, respect_pin=False)  # no raise
        with pytest.raises(StopIteration):
            next(seq)  # both probes were consumed

    def test_wait_skips_probe_when_platform_pinned(self, monkeypatch):
        """Under the test conftest jax_platforms is pinned to 'cpu': the
        tunnel probe must be skipped entirely (it can hang ~6 min on a
        down tunnel the caller never needs)."""
        def boom(timeout_s):
            raise AssertionError("probe must not run under a cpu pin")
        monkeypatch.setattr(B, "probe_backend", boom)
        B.wait_for_backend(max_attempts=3)  # no raise, no probe

    def test_graft_entry_falls_back_to_cpu_pin(self, monkeypatch):
        """A tunnel that stays down must degrade entry() to an XLA:CPU
        compile check (pin recorded via jax.config.update), never raise —
        the driver's compile artifact survives an environment outage."""
        import __graft_entry__ as g

        def down(**kw):
            raise RuntimeError("environment failure (TPU tunnel)")
        monkeypatch.setattr(B, "wait_for_backend", down)
        pins = []
        monkeypatch.setattr(g.jax.config, "update",
                            lambda k, v: pins.append((k, v)))
        g._ensure_backend()  # no raise
        assert pins == [("jax_platforms", "cpu")]

    def test_default_backend_tolerates_init_failure(self, monkeypatch):
        def boom():
            raise RuntimeError("Unable to initialize backend 'axon'")
        monkeypatch.setattr(B.jax, "default_backend", boom)
        assert B.default_backend() == "cpu"
        assert not B.on_tpu()


class TestPersistentCache:
    def test_cpu_dir_is_microarch_keyed_and_set(self):
        """On a CPU backend the cache dir must carry the cpuinfo
        fingerprint (a foreign-host AOT entry can SIGILL), must match the
        conftest's dir (one cache per host, not two), and must land in
        the live jax config."""
        d = B.enable_persistent_cache()
        assert d.startswith("/tmp/jax_cache_cpu_") and len(d.split("_")[-1]) == 10
        import os
        assert d == os.environ["JAX_COMPILATION_CACHE_DIR"]  # conftest's
        assert jax.config.jax_compilation_cache_dir == d

    def test_tpu_backend_gets_shared_dir(self, monkeypatch):
        monkeypatch.setattr(B, "default_backend", lambda: "tpu")
        sets = {}
        monkeypatch.setattr(B.jax.config, "update",
                            lambda k, v: sets.__setitem__(k, v))
        assert B.enable_persistent_cache() == "/tmp/jax_cache_tpu"
        assert sets["jax_compilation_cache_dir"] == "/tmp/jax_cache_tpu"
