"""Observability: metrics logging, profiling, device asserts.

Parity targets (SURVEY.md section 5):
  * TensorBoard scalars/images per loss term + PSNR/SSIM + Gaussian count
    (train_pan.py:509-568) — here via torch.utils.tensorboard when present,
    always mirrored to a JSONL file (machine-readable, no deps).
  * ClearML experiment tracking with offline fallback
    (utils/clearml_utils.py) — replaced by the JSONL + run-config snapshot
    (cfg_args parity) since ClearML isn't in this environment; the logger
    interface accepts a `remote` callback for such integrations.
  * tracing/profiling — the reference has none (tqdm only); here:
    jax.profiler trace context + a step-timing summary.
  * race detection — CUDA's CHECK_CUDA(debug) analog: `checkify_nan_guard`
    wraps a function with jax.debug NaN checking.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from typing import Callable, Optional

import numpy as np


class MetricsLogger:
    """JSONL + optional TensorBoard scalar logger."""

    def __init__(self, log_dir: str, use_tensorboard: bool = True,
                 remote: Optional[Callable] = None):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.remote = remote
        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(log_dir)
            except Exception:
                self.tb = None

    def log_scalars(self, metrics: dict, step: int):
        row = {"step": step}
        for k, v in metrics.items():
            try:
                row[k] = float(v)
            except (TypeError, ValueError):
                continue
        self.jsonl.write(json.dumps(row) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in row.items():
                if k != "step":
                    self.tb.add_scalar(k, v, step)
        if self.remote is not None:
            self.remote(row, step)

    def log_image(self, tag: str, img_chw, step: int):
        if self.tb is not None:
            self.tb.add_image(tag, np.clip(np.asarray(img_chw), 0, 1), step)
        else:
            import imageio.v2 as iio

            d = os.path.join(self.log_dir, "images")
            os.makedirs(d, exist_ok=True)
            arr = np.clip(np.asarray(img_chw), 0, 1)
            if arr.ndim == 3:
                arr = arr.transpose(1, 2, 0)
            iio.imwrite(
                os.path.join(d, f"{tag.replace('/', '_')}_{step:06d}.png"),
                (arr * 255).astype(np.uint8),
            )

    def save_config(self, cfg, name: str = "cfg_args.json"):
        """Run-config snapshot (train_pan.py:826-828 parity)."""

        def enc(o):
            if dataclasses.is_dataclass(o):
                return dataclasses.asdict(o)
            if isinstance(o, (np.integer, np.floating)):
                return float(o)
            return str(o)

        with open(os.path.join(self.log_dir, name), "w") as f:
            json.dump(cfg, f, default=enc, indent=1)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


class ProfilerContext:
    """jax.profiler trace wrapper: `with ProfilerContext(dir): ...` writes a
    TensorBoard-compatible trace of device execution."""

    def __init__(self, log_dir: str, enabled: bool = True):
        self.log_dir = log_dir
        self.enabled = enabled

    def __enter__(self):
        if self.enabled:
            import jax

            jax.profiler.start_trace(self.log_dir)
        return self

    def __exit__(self, *exc):
        if self.enabled:
            import jax

            jax.profiler.stop_trace()
        return False


class StepTimer:
    """Lightweight per-stage wall-clock accounting."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    def track(self, name: str):
        timer = self

        class _Ctx:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                dt = time.perf_counter() - self.t0
                timer.totals[name] = timer.totals.get(name, 0.0) + dt
                timer.counts[name] = timer.counts.get(name, 0) + 1
                return False

        return _Ctx()

    def summary(self):
        return {
            k: {"total_s": round(v, 4), "mean_ms": round(v / self.counts[k] * 1e3, 3)}
            for k, v in self.totals.items()
        }


def checkify_nan_guard(fn):
    """Wrap a jittable fn so NaN/Inf in its outputs raises — the analog of
    the reference's CHECK_CUDA(debug)/detect_anomaly paths."""
    import jax
    from jax.experimental import checkify

    checked = checkify.checkify(fn, errors=checkify.float_checks)

    def wrapped(*args, **kwargs):
        err, out = checked(*args, **kwargs)
        err.throw()
        return out

    return wrapped
