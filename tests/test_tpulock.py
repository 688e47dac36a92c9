"""Chip-lock serialization (utils/tpulock): the round-4 bench-contention fix.

BENCH_r04 recorded 3.452 steps/s because the repo's own OOD campaign was
mid-sweep on the same chip when the driver's bench fired; every TPU entry
point now serializes through this advisory flock (VERDICT r4 item 2).
"""

import json
import os
import subprocess
import sys
import time

import pytest

from maxstyle_tpu.utils import tpulock
from maxstyle_tpu.utils.tpulock import chip_lock, lock_holder, yield_to_bench


@pytest.fixture(autouse=True)
def _isolated_lock(tmp_path, monkeypatch):
    monkeypatch.setattr(tpulock, "LOCK_PATH", str(tmp_path / "chip.lock"))
    monkeypatch.setattr(tpulock, "BENCH_FLAG", str(tmp_path / "bench.flag"))


class TestChipLock:
    def test_uncontended_acquire(self):
        with chip_lock("t") as info:
            assert info == {"waited_s": 0.0, "contended": False,
                            "acquired": True}
            assert lock_holder()["tag"] == "t"

    def test_release_allows_reacquire(self):
        with chip_lock("a"):
            pass
        with chip_lock("b", timeout_s=1) as info:
            assert info["acquired"] and not info["contended"]

    def test_contended_times_out_but_still_runs(self):
        """An advisory lock must never turn a measurement into a
        no-result: on timeout the block runs with acquired=False."""
        code = (
            "import sys, json; sys.path.insert(0, %r)\n"
            "from maxstyle_tpu.utils import tpulock\n"
            "tpulock.LOCK_PATH = %r\n"
            "from maxstyle_tpu.utils.tpulock import chip_lock\n"
            "with chip_lock('inner', timeout_s=1.5, poll_s=0.2) as i:\n"
            "    print(json.dumps(i))\n"
        ) % (os.getcwd(), tpulock.LOCK_PATH)
        with chip_lock("outer"):
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=60)
        info = json.loads(r.stdout)
        assert info["contended"] and not info["acquired"]
        assert info["waited_s"] >= 1.5

    def test_cross_process_serialization(self):
        """Second process acquires only after the first releases."""
        code = (
            "import sys, json, time; sys.path.insert(0, %r)\n"
            "from maxstyle_tpu.utils import tpulock\n"
            "tpulock.LOCK_PATH = %r\n"
            "from maxstyle_tpu.utils.tpulock import chip_lock\n"
            "with chip_lock('inner', timeout_s=30, poll_s=0.1) as i:\n"
            "    print(json.dumps({**i, 't_acquired': time.time()}))\n"
        ) % (os.getcwd(), tpulock.LOCK_PATH)
        proc = subprocess.Popen([sys.executable, "-c", code],
                                stdout=subprocess.PIPE, text=True)
        try:
            with chip_lock("holder"):
                # hold long enough that the child (however slow its
                # interpreter start) is blocked in its wait loop
                time.sleep(2.5)
                t_release = time.time()
            out, _ = proc.communicate(timeout=60)
        finally:
            proc.kill()
        info = json.loads(out)
        assert info["acquired"]
        # the child could not have held the lock before we released it
        assert info["t_acquired"] >= t_release - 0.05

    def test_holder_info_cleared_on_release(self):
        with chip_lock("t"):
            pass
        assert lock_holder() in (None, {})


class TestBenchPriority:
    def test_bench_flag_raised_while_waiting_and_cleaned(self):
        code = (
            "import sys; sys.path.insert(0, %r)\n"
            "from maxstyle_tpu.utils import tpulock\n"
            "tpulock.LOCK_PATH = %r\n"
            "tpulock.BENCH_FLAG = %r\n"
            "from maxstyle_tpu.utils.tpulock import chip_lock\n"
            "with chip_lock('bench', timeout_s=1.5, poll_s=0.2,\n"
            "               bench_priority=True):\n"
            "    pass\n"
        ) % (os.getcwd(), tpulock.LOCK_PATH, tpulock.BENCH_FLAG)
        with chip_lock("sweep"):
            proc = subprocess.Popen([sys.executable, "-c", code])
            deadline = time.time() + 30
            while (not os.path.exists(tpulock.BENCH_FLAG)
                   and time.time() < deadline):
                time.sleep(0.05)
            assert os.path.exists(tpulock.BENCH_FLAG), \
                "waiting bench must raise its flag"
            proc.wait(timeout=60)
        assert not os.path.exists(tpulock.BENCH_FLAG), \
            "flag must be removed when bench exits"

    def test_yield_to_bench_waits_for_flag(self):
        with open(tpulock.BENCH_FLAG, "w") as f:
            f.write("{}")
        t0 = time.monotonic()
        waited = yield_to_bench(max_wait_s=0.6, poll_s=0.1)
        assert waited >= 0.5
        assert time.monotonic() - t0 >= 0.5

    def test_yield_no_flag_returns_immediately(self):
        assert yield_to_bench() == 0.0
