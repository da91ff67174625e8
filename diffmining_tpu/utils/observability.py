"""Tracing / profiling / metrics — greenfield vs the reference (SURVEY.md §5.1:
the reference has only tqdm bars and a wall-clock Timer in the Doersch
baseline, doersch.py:31-44).

  * Timer           — the reference's context manager, kept for parity.
  * trace           — jax.profiler trace context (TensorBoard-viewable).
  * annotate        — jax.profiler.TraceAnnotation for named spans.
  * MetricsLogger   — JSONL metrics stream (step, wall time, values); the
                      training loop writes train_loss/lr here, replacing the
                      reference's accelerate TensorBoard logging.
  * StepTimer       — per-stage step timing with EMA smoothing.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Optional


class Timer:
    """Wall-clock context manager (reference doersch.py:31-44)."""

    def __init__(self, tag: str, quiet: bool = False):
        self.tag = tag
        self.quiet = quiet
        self.elapsed = 0.0

    def __enter__(self):
        self.start_time = time.time()
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        self.elapsed = time.time() - self.start_time
        if not self.quiet:
            minutes = int(self.elapsed // 60)
            print(f"{self.tag} took {minutes}m {self.elapsed % 60:.2f}s")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace; view with TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span visible in profiler timelines."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class MetricsLogger:
    """Append-only JSONL metrics (one object per step), with optional
    TensorBoard event mirroring (`report_to="tensorboard"` — the reference's
    default tracker via accelerate, base.py:103-117/args.py:198-206; torch's
    SummaryWriter is used when available, silently skipped otherwise)."""

    def __init__(self, path: str, report_to: str = ""):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._f = open(path, "a", buffering=1)
        self._t0 = time.time()
        self._tb = None
        if report_to == "tensorboard":
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.dirname(os.path.abspath(path)))
            except Exception:
                self._tb = None

    def log(self, step: int, **values: Any) -> None:
        rec = {"step": int(step), "wall_s": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if hasattr(v, "__float__") else v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step" and isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, int(step))

    def close(self) -> None:
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class StepTimer:
    """EMA-smoothed per-step timing for throughput reporting."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self.ema: Optional[float] = None
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema = dt if self.ema is None else self.smoothing * self.ema + (1 - self.smoothing) * dt
        self._last = now
        return self.ema

    def steps_per_sec(self) -> Optional[float]:
        return (1.0 / self.ema) if self.ema else None
