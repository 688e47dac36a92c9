"""Backend probing that tolerates a flaky remote-TPU tunnel.

On the bench host the TPU is reached through a tunnel whose plugin can
fail backend *initialization* transiently (``RuntimeError: Unable to
initialize backend 'axon': UNAVAILABLE``). ``jax.default_backend()``
eagerly initializes the backend, so any constructor that merely wants to
pick TPU-vs-CPU defaults would crash outright on a tunnel hiccup. These
helpers catch that and fall back, so platform probes never take a process
down (the round-3 bench artifact died exactly this way).
"""

import subprocess
import sys
import time

import jax


def probe_backend(timeout_s: float = 120.0, env=None):
    """Check backend init in a throwaway subprocess; returns (ok, detail).
    ``env`` defaults to the caller's environment (the probe must exercise
    the same plugin stack the parent will use).

    Two tunnel failure modes, both observed on driver artifacts:
    round 3 raised ``UNAVAILABLE`` at init (cached for the life of the
    process by jax), and round 4 *hung* inside ``jax.devices()`` with no
    exception at all. A child process sidesteps both — a hang becomes a
    ``TimeoutExpired`` (child killed), a failure never poisons the parent's
    jax state, and on success the parent initializes against a
    known-healthy tunnel."""
    code = "import jax; print(jax.default_backend(), len(jax.devices()))"
    try:
        r = subprocess.run([sys.executable, "-c", code], env=env,
                           capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, (f"backend init still hung after {timeout_s:.0f}s "
                       "(tunnel not answering)")
    if r.returncode != 0:
        tail = (r.stderr or "").strip().splitlines()
        return False, (tail[-1] if tail else f"probe exited rc={r.returncode}")
    return True, r.stdout.strip()


def wait_for_backend(max_attempts: int = 3, probe_timeout: float = 120.0,
                     tag: str = "backend", respect_pin: bool = True) -> None:
    """Block until a subprocess probe confirms the backend initializes,
    retrying with backoff (60 s, then 120 s, ...). Raises RuntimeError with
    a diagnostic after ``max_attempts`` failures (~9.5 min at defaults) —
    an environment verdict, never a silent hang.

    When the parent has explicitly pinned a local platform
    (``jax.config.update("jax_platforms", "cpu")`` — the test conftest and
    the dryrun child do this), there is no tunnel to wait for and the
    probe is skipped: a subprocess probe would NOT inherit the pin (the
    axon plugin silently overrides the JAX_PLATFORMS env var) and would
    hang on a down tunnel even though the caller never needs it.
    `respect_pin=False` forces the probe loop regardless (tests of the
    retry machinery)."""
    pinned = getattr(jax.config, "jax_platforms", None) or ""
    if (respect_pin and pinned
            and all(p in ("cpu", "gpu") for p in pinned.split(","))):
        print(f"[{tag}] platform pinned to '{pinned}' — skipping tunnel "
              f"probe", file=sys.stderr)
        return
    for attempt in range(1, max_attempts + 1):
        ok, detail = probe_backend(probe_timeout)
        if ok:
            print(f"[{tag}] backend ready: {detail} "
                  f"(attempt {attempt}/{max_attempts})", file=sys.stderr)
            return
        print(f"[{tag}] backend probe failed (attempt {attempt}/"
              f"{max_attempts}): {detail}", file=sys.stderr)
        if attempt == max_attempts:
            raise RuntimeError(
                f"backend unavailable through {max_attempts} bounded probes "
                f"— environment failure (TPU tunnel), not a framework one. "
                f"Last: {detail}")
        delay = 60 * attempt
        print(f"[{tag}] retrying in {delay}s", file=sys.stderr)
        time.sleep(delay)


def default_backend(fallback: str = "cpu") -> str:
    """`jax.default_backend()`, but a failed backend init returns
    ``fallback`` instead of raising. Callers use this only to choose
    platform-appropriate defaults (pallas vs jnp, bf16 vs f32); actual
    device work will surface the real error at dispatch time."""
    try:
        return jax.default_backend()
    except Exception as e:  # RuntimeError / JaxRuntimeError from plugin init
        print(f"[maxstyle_tpu] backend probe failed ({type(e).__name__}: "
              f"{e}); assuming '{fallback}' for platform defaults",
              file=sys.stderr)
        return fallback


def on_tpu() -> bool:
    return default_backend() not in ("cpu", "gpu")


def enable_persistent_cache() -> str:
    """Point JAX's persistent compilation cache at a host-appropriate
    directory (idempotent; returns the directory chosen).

    Later processes then *load* the fused train-step program instead of
    recompiling it: through the flaky TPU tunnel a cold compile is
    minutes of exposure, a cache hit is seconds — this protects bench.py
    re-runs, the resumable OOD sweeps (one compile per method, reused
    across seeds/retries/flaps) and the driver's round-close run. XLA
    fingerprints entries by platform/compiler version, but a CPU cache
    written by a different microarchitecture can still SIGILL at AOT
    load (observed on this image — tests/conftest.py), so the CPU dir is
    additionally keyed by the host's cpuinfo flags; accelerator entries
    live in a shared stable dir."""
    if default_backend() in ("cpu", "gpu"):
        import hashlib
        try:
            with open("/proc/cpuinfo") as f:
                flags = next(ln for ln in f if ln.startswith("flags"))
        except (OSError, StopIteration):
            flags = "unknown"
        d = ("/tmp/jax_cache_cpu_"
             + hashlib.sha1(flags.encode()).hexdigest()[:10])
    else:
        d = "/tmp/jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return d
