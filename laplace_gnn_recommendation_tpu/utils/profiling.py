"""Profiling: host-side cProfile wrapper + device-side jax.profiler traces +
speed-of-light accounting.

The reference ships only a cProfile wrapper (``utils/profiling.py:5-26``,
vestigial). The TPU build adds what SURVEY §5 calls for: ``jax.profiler``
trace capture around hot sections and a roofline helper that turns
(bytes moved, flops, seconds) into fraction-of-peak numbers so kernels can be
judged against speed-of-light.
"""
from __future__ import annotations

import cProfile
import contextlib
import pstats
import time
from dataclasses import dataclass
from typing import Optional


class Profiler:
    """cProfile wrapper — API-compatible with reference ``utils/profiling.py``."""

    def __init__(self, every: int = 20, dump_path: str = "stats.dmp"):
        self.profile = cProfile.Profile()
        self.every = every
        self.count = 0
        self.dump_path = dump_path

    def start(self) -> None:
        self.profile.enable()

    def stop(self) -> None:
        self.profile.disable()
        self.count += 1
        if self.count % self.every == 0:
            self.print_stats()

    def print_stats(self) -> None:
        self.profile.dump_stats(self.dump_path)
        stats = pstats.Stats(self.profile)
        stats.sort_stats("tottime").print_stats(8)


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace capture (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# TPU v5e single-chip peaks (public numbers): 394 TFLOP/s bf16, 819 GB/s HBM.
TPU_V5E_PEAK_FLOPS_BF16 = 394e12
TPU_V5E_PEAK_HBM_BYTES = 819e9


@dataclass
class Roofline:
    """Speed-of-light accounting for one kernel/section."""

    name: str
    seconds: float
    flops: float = 0.0
    bytes_moved: float = 0.0
    peak_flops: float = TPU_V5E_PEAK_FLOPS_BF16
    peak_bytes: float = TPU_V5E_PEAK_HBM_BYTES

    @property
    def achieved_flops(self) -> float:
        return self.flops / max(self.seconds, 1e-12)

    @property
    def achieved_bandwidth(self) -> float:
        return self.bytes_moved / max(self.seconds, 1e-12)

    @property
    def arithmetic_intensity(self) -> float:
        return self.flops / max(self.bytes_moved, 1.0)

    @property
    def bound(self) -> str:
        ridge = self.peak_flops / self.peak_bytes
        return "compute" if self.arithmetic_intensity > ridge else "memory"

    @property
    def fraction_of_peak(self) -> float:
        """Fraction of the binding roofline actually achieved."""
        if self.bound == "compute":
            return self.achieved_flops / self.peak_flops
        return self.achieved_bandwidth / self.peak_bytes

    def report(self) -> str:
        return (
            f"{self.name}: {self.seconds*1e3:.3f} ms, "
            f"{self.achieved_flops/1e12:.2f} TF/s, "
            f"{self.achieved_bandwidth/1e9:.1f} GB/s, "
            f"AI={self.arithmetic_intensity:.2f} ({self.bound}-bound), "
            f"{100*self.fraction_of_peak:.1f}% of speed-of-light"
        )


class Timer:
    """Wall-clock section timer with block_until_ready discipline."""

    def __init__(self):
        self.t0: Optional[float] = None
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        return False
