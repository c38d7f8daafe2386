"""Observability: structured metrics + on-demand XLA profiling.

The reference's only observability is print()-based: wall-clock minutes per
epoch (``train.py:295``, ``:337-339``) and running loss/dev-accuracy prints.
The TPU build keeps those exact lines (parity) and adds, per SURVEY.md §5:

* ``MetricsLogger`` — structured per-epoch/per-event JSONL records
  (epoch, loss, frame/segment accuracy, lr, wall seconds, frames/sec/chip —
  the BASELINE.json headline unit) appended to a user-chosen file.
* ``profile_trace`` — a context manager around ``jax.profiler.trace`` that
  captures a TensorBoard-loadable XLA trace (HLO timelines, fusion views)
  for any region; no-op when no directory is given.
* ``StepTimer`` — device-sync-aware throughput meter: ``block_until_ready``
  on the last step output before reading the clock, so asynchronous dispatch
  cannot inflate frames/sec.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Any, Iterator

import jax

__all__ = ["MetricsLogger", "profile_trace", "StepTimer"]


class MetricsLogger:
    """Append structured metric records to a JSONL file (one JSON per line).

    Records always carry ``event`` and ``time`` keys; everything else is
    caller-provided.  A ``path`` of ``None`` disables writing (all calls
    become cheap no-ops) so call sites need no conditionals.
    """

    def __init__(self, path: str | None, resume: bool = False):
        """``resume=True`` appends to an existing file (preempted run
        restarted with ``--resume``) instead of truncating it — previously
        logged epochs survive; a ``run_start`` record marks the boundary."""
        self.path = path
        if path:
            d = os.path.dirname(path)
            if d:
                os.makedirs(d, exist_ok=True)
            if not resume:
                # truncate: one file per fresh run
                with open(path, "w"):
                    pass
            self.log("run_start", resumed=bool(resume))

    def log(self, event: str, **fields: Any) -> None:
        if not self.path:
            return
        rec = {"event": event, "time": round(time.time(), 3)}
        rec.update(fields)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def epoch(
        self,
        epoch: int,
        loss: float,
        frame_acc: float,
        seg_acc: float,
        lr: float,
        wall_s: float,
        frames: int,
    ) -> None:
        self.log(
            "epoch",
            epoch=epoch,
            train_loss=round(loss, 6),
            dev_frame_acc=round(frame_acc, 4),
            dev_segment_acc=round(seg_acc, 4),
            lr=lr,
            wall_s=round(wall_s, 3),
            frames=frames,
            frames_per_sec=round(frames / wall_s, 1) if wall_s > 0 else None,
        )


@contextlib.contextmanager
def profile_trace(profile_dir: str | None) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace of the enclosed region into
    ``profile_dir`` (TensorBoard: ``tensorboard --logdir <dir>``).  No-op if
    ``profile_dir`` is falsy, and degrades to a no-op with a warning if the
    profiler cannot start (e.g. another trace already active)."""
    if not profile_dir:
        yield
        return
    os.makedirs(profile_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(profile_dir)
    except Exception as e:  # pragma: no cover - depends on runtime state
        print(f"[observability] profiler unavailable: {e}")
        yield
        return
    try:
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception as e:  # pragma: no cover
            print(f"[observability] profiler stop failed: {e}")


class StepTimer:
    """Throughput meter for the train loop.

    ``note(frames, result)`` accumulates frame counts; ``elapsed()`` blocks
    on the most recent device value first so async dispatch can't make the
    loop look faster than the hardware.
    """

    def __init__(self) -> None:
        self.frames = 0
        self._last: Any = None
        self._start = time.perf_counter()

    def note(self, frames: int, result: Any = None) -> None:
        self.frames += int(frames)
        if result is not None:
            self._last = result

    def elapsed(self) -> float:
        if self._last is not None:
            try:
                jax.block_until_ready(self._last)
            except Exception:
                pass
        return time.perf_counter() - self._start

    def frames_per_sec(self) -> float:
        dt = self.elapsed()
        return self.frames / dt if dt > 0 else 0.0
