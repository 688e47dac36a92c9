"""Test configuration: force CPU backend with 8 virtual devices so sharding
tests exercise a multi-chip mesh without TPU hardware (SURVEY.md §4e)."""

import os

# force CPU: the machine exports JAX_PLATFORMS=axon (one real TPU chip);
# tests must run on the virtual 8-device CPU mesh and never contend for it.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
# XLA CPU's space-to-batch pass crashes on maxpool-UNet backprop convs
# (shape check failure in PropagateOnBackpropFilterConv); disable it.
if "space-to-batch" not in _flags:
    _flags += " --xla_disable_hlo_passes=space-to-batch-converter"
os.environ["XLA_FLAGS"] = _flags

# dedicated CPU cache, fingerprinted by host CPU: XLA:CPU AOT entries carry
# machine features and can SIGILL when loaded on a different machine (the
# bench fleet migrates /tmp between hosts)
import hashlib
import platform


def _cpu_cache_dir():
    try:
        flags = [l for l in open("/proc/cpuinfo") if l.startswith("flags")][0]
    except Exception:
        flags = platform.processor()
    tag = hashlib.sha1(flags.encode()).hexdigest()[:10]
    return f"/tmp/jax_cache_cpu_{tag}"


os.environ["JAX_COMPILATION_CACHE_DIR"] = _cpu_cache_dir()

# tests must never contend for (or block on) the REAL chip's advisory
# lock — a background TPU campaign may hold it for many minutes
# (utils/tpulock.py reads these at import time)
os.environ.setdefault("MAXSTYLE_TPU_LOCK", "/tmp/maxstyle_test_chip.lock")
os.environ.setdefault("MAXSTYLE_TPU_BENCH_FLAG",
                      "/tmp/maxstyle_test_bench.flag")

import jax  # noqa: E402

# belt-and-braces: some import path may have loaded jax before this conftest
# (the env var alone is then ignored), so set the config explicitly too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest  # noqa: E402

# Slow tests split two ways: `core` = slow but load-bearing (end-to-end
# cycles, sharding, the reference-EXECUTABLE parity pins, the production
# drill) — the prioritized pre-close gate is `-m "not slow or core"`
# (`make test-preclose`, ~half the full-suite latency on this 1-core
# host). The remaining slow tests cover the library surface
# (per-function parity pins, model-family compiles) and regress far less
# often.
_CORE_SLOW_MODULES = {
    "test_end_to_end", "test_sharding", "test_dp_trainer",
    "test_reference_executable_parity", "test_golden_losses",
    "test_full_path_drill", "test_train_cli", "test_train_step",
}


def pytest_collection_modifyitems(items):
    for item in items:
        if (item.get_closest_marker("slow")
                and item.module.__name__ in _CORE_SLOW_MODULES):
            item.add_marker(pytest.mark.core)
