"""Profiling / tracing helpers.

The reference instruments every phase with std::chrono timers and OpenCL
event profiling (opencl_utils.hpp:331-361). The TPU equivalents:

  - `phase_timer`: wall-clock phase timing (host-side phases: pack, put).
  - `device_trace`: jax.profiler trace context (open in TensorBoard /
    xprof to see kernel timelines, DMA overlap, HBM utilization).
  - `timed_slope`: the tunnel-safe device timing used by bench.py —
    slope between short and long on-device iteration counts.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def phase_timer(name: str, sink: dict | None = None, verbose: bool = False):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = dt
    if verbose:
        print(f"[{name}] {dt * 1e3:.2f} ms")


@contextlib.contextmanager
def device_trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_slope(run_n, short: int, long_: int, reps: int = 5) -> float:
    """Per-iteration device time from the slope of two chained run lengths.

    run_n(n) must execute n chained device iterations and block until the
    result is on host (np.asarray). Returns seconds per iteration.

    Each slope pairs ADJACENT short/long runs (chip/tunnel contention
    drifts over minutes) and the median of reps rejects outliers; a
    (long_ - short) under ~50 iterations of a sub-ms kernel is below the
    dispatch-noise floor — prefer 4/104.
    """
    run_n(short)
    run_n(long_)

    def once(n):
        t0 = time.perf_counter()
        run_n(n)
        return time.perf_counter() - t0

    slopes = sorted(
        (once(long_) - once(short)) / (long_ - short) for _ in range(reps))
    return slopes[len(slopes) // 2]


def enable_compilation_cache(path: "str | None" = None) -> None:
    """Persistent executable cache: kernel compiles through the axon
    remote-compile tunnel cost tens to hundreds of seconds each (a
    trivial 256x256 matmul measured 388 s under tunnel congestion);
    cached reloads are ~0.5 s. Verified working on the axon PJRT backend
    (second fresh process: 0.61 s for the same program). Safe to call
    multiple times. The default path is anchored at the REPO ROOT so
    every entry point (bench.py, full_eval, labs, serving scripts)
    shares one cache regardless of cwd.

    CPU backends are excluded: XLA:CPU AOT executables are keyed without
    the host's CPU feature set, so an artifact cached on one machine
    SIGILLs/segfaults when loaded on another (observed: an avx512-built
    cache entry crashing the pytest CPU suite on this host). CPU compiles
    are fast; only the remote TPU compiles are worth persisting."""
    import os

    import jax

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    try:
        if str(jax.config.jax_platforms or "").startswith("cpu"):
            return
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
