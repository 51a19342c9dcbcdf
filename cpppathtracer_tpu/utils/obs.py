"""Observability: structured logging, phase timing, throughput metrics.

The reference has a printf file logger with [time][level][file:line]
prefixes (`include/logger.hpp:12-80`) and one wall-clock frame-time log
line (`path_tracer.cu:300`).  Here: stdlib logging with the same shape of
prefix, per-phase timers that understand JAX async dispatch (they block on
the result before reading the clock), a rays/s meter (the north-star
metric), and optional jax.profiler trace capture for deep dives.
"""

from __future__ import annotations

import contextlib
import json
import logging
import os
import time

import jax

_FMT = "[%(asctime)s][%(levelname)s][%(filename)s:%(lineno)d] %(message)s"


def get_logger(name: str = "poca", log_dir: str | None = None) -> logging.Logger:
    """File+console logger (default file ./logs/cpppathtracer_tpu.log, the
    analog of ./logs/CUDAPathTracer.log)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(sh)
    log_dir = log_dir or os.environ.get("POCA_LOG_DIR", "./logs")
    try:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, "cpppathtracer_tpu.log"))
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    except OSError:
        pass
    return logger


class Timer:
    """Wall-clock timer (timer.hpp analog) that blocks on JAX values."""

    @staticmethod
    def now_ms() -> float:
        return time.time() * 1000.0

    @staticmethod
    @contextlib.contextmanager
    def phase(name: str, sink: dict | None = None):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if "result" in holder:
                jax.block_until_ready(holder["result"])
            dt = time.perf_counter() - t0
            if sink is not None:
                sink[name] = sink.get(name, 0.0) + dt


class RaysPerSecond:
    """Running throughput meter for the north-star metric."""

    def __init__(self):
        self.total_rays = 0
        self.total_seconds = 0.0

    def add(self, width: int, height: int, spp: int, max_depth: int, seconds: float):
        self.total_rays += width * height * spp * max_depth
        self.total_seconds += seconds

    @property
    def rays_per_sec(self) -> float:
        return self.total_rays / self.total_seconds if self.total_seconds else 0.0

    def report(self) -> dict:
        return {
            "rays": self.total_rays,
            "seconds": self.total_seconds,
            "rays_per_sec": self.rays_per_sec,
        }


class MetricsLog:
    """Append-only JSONL metrics (per-step rays/s, spp, grad norms,
    scaling efficiency — SURVEY.md §5's structured-metrics requirement)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def log(self, **kv):
        kv.setdefault("t", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(kv) + "\n")


@contextlib.contextmanager
def profiler_trace(log_dir: str):
    """jax.profiler trace capture around a block (view in TensorBoard /
    xprof) — kernel-level visibility the reference never had."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
