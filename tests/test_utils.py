"""Unit tests for the small host-side utilities (prefetch, observability,
run-length)."""

import json
import time

import numpy as np
import pytest

from pytorch_video_action_tpu.utils.observability import (
    MetricsLogger,
    StepTimer,
    profile_trace,
)
from pytorch_video_action_tpu.utils.prefetch import prefetch_iter
from pytorch_video_action_tpu.utils.runlength import run_length_segments


def test_prefetch_preserves_order_and_items():
    items = [(np.full((2, 2), i), i) for i in range(50)]
    out = list(prefetch_iter(iter(items), size=3))
    assert len(out) == 50
    for i, (arr, tag) in enumerate(out):
        assert tag == i and arr[0, 0] == i


def test_prefetch_propagates_exceptions():
    def gen():
        yield 1
        yield 2
        raise ValueError("boom at item 3")

    it = prefetch_iter(gen(), size=2)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetch_runs_ahead():
    """The producer should be able to run ahead of a slow consumer."""
    produced = []

    def gen():
        for i in range(4):
            produced.append(i)
            yield i

    it = prefetch_iter(gen(), size=2)
    first = next(it)
    time.sleep(0.05)  # give the worker time to fill the queue
    assert first == 0
    assert len(produced) >= 3  # item 0 consumed + 2 queued ahead


def test_metrics_logger_disabled_and_enabled(tmp_path):
    MetricsLogger(None).log("noop", x=1)  # must be a cheap no-op

    path = str(tmp_path / "sub" / "m.jsonl")
    m = MetricsLogger(path)
    m.epoch(1, 0.5, 90.0, 85.0, 1e-3, 2.0, 1000)
    m.log("custom", foo="bar")
    records = [json.loads(l) for l in open(path)]
    assert records[0]["event"] == "run_start" and not records[0]["resumed"]
    assert records[1]["event"] == "epoch"
    assert records[1]["frames_per_sec"] == 500.0
    assert records[2] == {**records[2], "event": "custom", "foo": "bar"}
    # a fresh logger truncates (one file per run)...
    MetricsLogger(path)
    assert [json.loads(l)["event"] for l in open(path)] == ["run_start"]
    # ...but a RESUMED logger appends, preserving prior epochs (ADVICE r1)
    m2 = MetricsLogger(path, resume=True)
    m2.log("more")
    events = [json.loads(l)["event"] for l in open(path)]
    assert events == ["run_start", "run_start", "more"]
    assert json.loads(open(path).readlines()[1])["resumed"] is True


def test_profile_trace_noop_without_dir():
    with profile_trace(None):
        pass  # must not touch the profiler at all


def test_step_timer():
    t = StepTimer()
    t.note(100)
    t.note(200)
    assert t.frames == 300
    assert t.elapsed() >= 0.0
    assert t.frames_per_sec() > 0.0


def test_run_length_segments():
    labels = np.array([3, 3, 0, 0, 0, 7])
    seq, bounds = run_length_segments(labels)
    assert list(seq) == [3, 0, 7]
    assert list(bounds) == [0, 2, 5, 6]


def test_prefetch_abandoned_consumer_stops_producer():
    """Abandoning the generator early must unblock and stop the worker."""
    import threading

    started = threading.active_count()

    def gen():
        for i in range(10_000):
            yield i

    it = prefetch_iter(gen(), size=1)
    assert next(it) == 0
    it.close()  # GeneratorExit -> finally -> stop event
    deadline = time.time() + 2.0
    while threading.active_count() > started and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() <= started
