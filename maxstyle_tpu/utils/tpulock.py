"""Advisory single-chip lock: serialize every process that touches the TPU.

Round-4 lesson: the driver's official bench fired while this repo's own OOD
campaign was mid-sweep on the same single chip / 1-core host, and recorded
3.452 steps/s against the uncontended 4.245 (BENCH_r04.json vs
benchmarks/bench_history.jsonl). Nothing on this host serializes TPU users;
this module is that serialization.

Every TPU entry point (bench.py, scripts/ood_method_comparison.py,
scripts/exp_inner_unroll.py, scripts/bench_aug_interp.py,
scripts/bench_scaling.py) wraps its chip work in `chip_lock(tag)`. The lock
is an `fcntl.flock` on a shared /tmp path, so it works across unrelated
Python processes and is released by the kernel even if the holder dies.

Priority protocol: the official bench matters more than any sweep. While
bench is waiting for the lock it raises a flag file; sweeps call
`yield_to_bench()` between arms and sleep until the flag clears, so bench
never waits longer than one in-flight arm.
"""

from __future__ import annotations

import fcntl
import json
import os
import sys
import time
from contextlib import contextmanager

LOCK_PATH = os.environ.get("MAXSTYLE_TPU_LOCK", "/tmp/maxstyle_tpu_chip.lock")
BENCH_FLAG = os.environ.get("MAXSTYLE_TPU_BENCH_FLAG",
                            "/tmp/maxstyle_tpu_bench_waiting")


def _log(msg: str) -> None:
    print(f"[tpulock] {msg}", file=sys.stderr, flush=True)


def lock_holder() -> dict | None:
    """Best-effort read of who currently holds (or last held) the lock."""
    try:
        with open(LOCK_PATH) as f:
            return json.loads(f.read() or "{}")
    except (OSError, ValueError):
        return None


@contextmanager
def chip_lock(tag: str, timeout_s: float = 3600.0, poll_s: float = 5.0,
              bench_priority: bool = False):
    """Hold the chip exclusively; yields an info dict.

    info = {"waited_s": float, "contended": bool, "acquired": bool}.
    On timeout the context still runs (an advisory lock must never turn a
    measurement into a no-result) but ``acquired`` is False so callers can
    label the number as contended.

    ``bench_priority=True`` (bench.py only) raises BENCH_FLAG while waiting
    so cooperating sweeps pause at their next arm boundary.
    """
    fd = os.open(LOCK_PATH, os.O_RDWR | os.O_CREAT, 0o666)
    info = {"waited_s": 0.0, "contended": False, "acquired": False}
    flag_raised = False
    t0 = time.monotonic()
    try:
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                info["acquired"] = True
                break
            except OSError:
                info["contended"] = True
                waited = time.monotonic() - t0
                if waited >= timeout_s:
                    _log(f"{tag}: lock timeout after {waited:.0f}s "
                         f"(holder: {lock_holder()}) — proceeding UNLOCKED")
                    break
                if bench_priority and not flag_raised:
                    try:
                        with open(BENCH_FLAG, "w") as f:
                            f.write(json.dumps({"tag": tag,
                                                "pid": os.getpid(),
                                                "since": time.time()}))
                        flag_raised = True
                    except OSError:
                        pass
                if int(waited) % 60 < poll_s:
                    _log(f"{tag}: waiting for chip "
                         f"(holder: {lock_holder()}, {waited:.0f}s)")
                time.sleep(poll_s)
        info["waited_s"] = round(time.monotonic() - t0, 1)
        if info["acquired"]:
            try:
                os.ftruncate(fd, 0)
                os.write(fd, json.dumps({
                    "tag": tag, "pid": os.getpid(),
                    "since": time.time()}).encode())
                os.fsync(fd)
            except OSError:
                pass
        yield info
    finally:
        if flag_raised:
            try:
                os.unlink(BENCH_FLAG)
            except OSError:
                pass
        try:
            if info["acquired"]:
                os.ftruncate(fd, 0)
                fcntl.flock(fd, fcntl.LOCK_UN)
        except OSError:
            pass
        os.close(fd)


def yield_to_bench(max_wait_s: float = 900.0, poll_s: float = 5.0) -> float:
    """Sweep-side courtesy: if the official bench is waiting for the chip,
    sleep (between arms, lock released) until it finishes. Returns seconds
    yielded."""
    t0 = time.monotonic()
    while os.path.exists(BENCH_FLAG):
        if time.monotonic() - t0 > max_wait_s:
            break
        if time.monotonic() - t0 < poll_s:
            _log("bench is waiting for the chip — pausing between arms")
        time.sleep(poll_s)
    return round(time.monotonic() - t0, 1)
