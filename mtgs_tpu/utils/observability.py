"""Observability: metric writers, step timing, and TPU trace tooling.

Replaces the reference's logging/profiling stack (OpenDriveLab/MTGS uses
nerfstudio's `writer` events routed to wandb/tensorboard/a rich local
writer, configured at `mtgs/config/MTGS.py:199-207`, plus a
`@profiler.time_function` decorator and rays/sec instrumentation at
`mtgs/scene_model/custom_pipeline.py:168-181`). TPU-native equivalents:

  * `LocalWriter` / `JsonlWriter` / `TensorboardWriter` / `MultiWriter` —
    the event sinks. Tensorboard uses torch's SummaryWriter when torch is
    importable (it is CPU-only in this image) and degrades to a no-op
    otherwise.
  * `StepTimer` — wall-clock per-step timing with EMA + rays/s.
  * `time_function` — accumulate wall time per label; `timing_summary()`
    to read it back.
  * `trace` / `summarize_trace` — wrap `jax.profiler.trace` and parse the
    emitted perfetto `*.trace.json.gz` into a per-op cost table: the tool
    used to find every rasterizer bottleneck in this repo (XLA op names
    carry `metadata.op_name` source attribution).
"""

from __future__ import annotations

import collections
import functools
import glob
import gzip
import json
import os
import time
from typing import Callable, Dict, List, Optional, Sequence, Tuple

_TIMERS: Dict[str, List[float]] = collections.defaultdict(list)


# --------------------------------------------------------------- writers


class Writer:
    """Event-sink protocol: scalars keyed by (name, step)."""

    def put_scalar(self, name: str, value: float, step: int) -> None:
        raise NotImplementedError

    def put_dict(self, values: Dict[str, float], step: int) -> None:
        for k, v in values.items():
            self.put_scalar(k, float(v), step)

    def flush(self) -> None:
        pass

    def close(self) -> None:
        self.flush()


class LocalWriter(Writer):
    """Compact stdout table every `steps_per_log` steps (ref: nerfstudio
    local writer with `steps_per_log=50`)."""

    def __init__(self, steps_per_log: int = 50, keys: Optional[Sequence[str]] = None):
        self.steps_per_log = steps_per_log
        self.keys = list(keys) if keys else None
        self._latest: Dict[str, float] = {}
        self._last_step = -1

    def put_scalar(self, name, value, step):
        self._latest[name] = value
        if step != self._last_step and step % self.steps_per_log == 0:
            self._last_step = step
            keys = self.keys or sorted(self._latest)
            parts = [f"step {step}"]
            parts += [
                f"{k}={self._latest[k]:.4g}" for k in keys if k in self._latest
            ]
            print("  ".join(parts), flush=True)


class JsonlWriter(Writer):
    """One JSON object per logged step — the machine-readable log the
    benchmark harness aggregates."""

    def __init__(self, path: str, steps_per_log: int = 10):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self._f = open(path, "a")
        self.steps_per_log = steps_per_log
        self._buf: Dict[str, float] = {}
        self._step = -1

    def put_scalar(self, name, value, step):
        if step != self._step:
            self._emit()
            self._step = step
        self._buf[name] = value

    def _emit(self):
        if self._buf and self._step % self.steps_per_log == 0:
            self._f.write(json.dumps({"step": self._step, **self._buf}) + "\n")
        self._buf = {}

    def flush(self):
        self._emit()
        self._f.flush()

    def close(self):
        self.flush()
        self._f.close()


class TensorboardWriter(Writer):
    """torch.utils.tensorboard sink; silently no-ops if unavailable."""

    def __init__(self, logdir: str):
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._w = SummaryWriter(logdir)
        except Exception:
            self._w = None

    def put_scalar(self, name, value, step):
        if self._w is not None:
            self._w.add_scalar(name, value, step)

    def flush(self):
        if self._w is not None:
            self._w.flush()


class MultiWriter(Writer):
    def __init__(self, writers: Sequence[Writer]):
        self.writers = list(writers)

    def put_scalar(self, name, value, step):
        for w in self.writers:
            w.put_scalar(name, value, step)

    def put_dict(self, values, step):
        for w in self.writers:
            w.put_dict(values, step)

    def flush(self):
        for w in self.writers:
            w.flush()


# ---------------------------------------------------------------- timing


class StepTimer:
    """Per-step wall time + EMA + rays/s (ref fps instrumentation,
    `custom_pipeline.py:168-181`)."""

    def __init__(self, pixels_per_step: int = 0, ema: float = 0.9):
        self.pixels = pixels_per_step
        self.ema = ema
        self._t: Optional[float] = None
        self.step_ms: float = 0.0

    def tick(self) -> Dict[str, float]:
        now = time.perf_counter()
        out: Dict[str, float] = {}
        if self._t is not None:
            dt = now - self._t
            self.step_ms = (
                self.ema * self.step_ms + (1 - self.ema) * dt * 1e3
                if self.step_ms
                else dt * 1e3
            )
            out["step_ms"] = self.step_ms
            if self.pixels:
                out["rays_per_s"] = self.pixels / (self.step_ms * 1e-3)
        self._t = now
        return out


def time_function(fn: Optional[Callable] = None, *, label: Optional[str] = None):
    """Decorator accumulating wall time under `label` (ref
    `@profiler.time_function`). Works on any host-side function; for
    jitted functions it measures dispatch+blocking of whatever the body
    synchronizes on."""

    def wrap(f):
        name = label or f.__qualname__

        @functools.wraps(f)
        def inner(*a, **kw):
            t0 = time.perf_counter()
            try:
                return f(*a, **kw)
            finally:
                _TIMERS[name].append(time.perf_counter() - t0)

        return inner

    return wrap(fn) if fn is not None else wrap


def timing_summary() -> Dict[str, Dict[str, float]]:
    return {
        k: {"calls": len(v), "total_s": sum(v), "mean_ms": sum(v) / len(v) * 1e3}
        for k, v in _TIMERS.items()
        if v
    }


def reset_timers() -> None:
    _TIMERS.clear()


# --------------------------------------------------------------- tracing


class trace:
    """Context manager around `jax.profiler.trace` writing to `logdir`.

    Usage:
        with observability.trace("/tmp/trace"):
            step()
        for line in observability.summarize_trace("/tmp/trace"): print(line)
    """

    def __init__(self, logdir: str):
        self.logdir = logdir

    def __enter__(self):
        import jax

        self._cm = jax.profiler.trace(self.logdir)
        self._cm.__enter__()
        return self

    def __exit__(self, *exc):
        return self._cm.__exit__(*exc)


def summarize_trace(
    logdir: str, top: int = 30, iters: int = 1
) -> List[Tuple[float, int, str]]:
    """Parse the newest perfetto trace under `logdir` into
    [(total_ms/iters, count/iters, op_name)], heaviest first. XLA op
    names (`fusion.N`, `sort.N`, custom-call names) can be mapped back to
    source lines by grepping the compiled HLO for `%<name> = `."""
    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return []
    events = json.load(gzip.open(files[-1]))["traceEvents"]
    dur: Dict[str, float] = collections.Counter()
    cnt: Dict[str, int] = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            dur[e.get("name", "?")] += e["dur"]
            cnt[e.get("name", "?")] += 1
    out = [
        (d / 1000.0 / iters, cnt[name] // iters, name)
        for name, d in dur.items()
    ]
    out.sort(reverse=True)
    return out[:top]
