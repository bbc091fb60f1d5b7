"""Self-time attribution in benchmarks/profile_capture.parse_device_ops.

The round-3 first on-chip capture summed nested trace events flat and
reported device_busy > wall-clock (each device microsecond counted once
per nesting level). Pin the corrected semantics on a synthetic trace:
nested children subtract from the parent's self time; device-busy sums
top-level durations only; non-device pids are ignored."""

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.profile_capture import parse_device_ops  # noqa: E402


def _write_trace(tmp_path, events):
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def test_nested_self_time_and_busy(tmp_path):
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0 Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "Host Threads"}},
        # device lane: jit(0..100) > while(10..90) > {matmul(20..50),
        # fusion(50..80)}; then a second top-level jit(120..140)
        {"ph": "X", "pid": 7, "tid": 1, "name": "jit_step", "ts": 0,
         "dur": 100},
        {"ph": "X", "pid": 7, "tid": 1, "name": "while", "ts": 10,
         "dur": 80},
        {"ph": "X", "pid": 7, "tid": 1, "name": "matmul", "ts": 20,
         "dur": 30},
        {"ph": "X", "pid": 7, "tid": 1, "name": "fusion", "ts": 50,
         "dur": 30},
        {"ph": "X", "pid": 7, "tid": 1, "name": "jit_step", "ts": 120,
         "dur": 20},
        # host pid event must be ignored entirely
        {"ph": "X", "pid": 9, "tid": 1, "name": "dispatch", "ts": 0,
         "dur": 1000},
    ]
    ops, busy = parse_device_ops(_write_trace(tmp_path, events))
    assert busy == 120.0                       # 100 + 20, children excluded
    assert ops["jit_step"] == 40.0             # (100-80) + 20
    assert ops["while"] == 20.0                # 80 - (30+30)
    assert ops["matmul"] == 30.0 and ops["fusion"] == 30.0
    assert "dispatch" not in ops
    # self times tile the busy span exactly
    assert abs(sum(ops.values()) - busy) < 1e-9


def test_parallel_lanes_sum(tmp_path):
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "TPU core 0"}},
        {"ph": "X", "pid": 7, "tid": 1, "name": "a", "ts": 0, "dur": 10},
        {"ph": "X", "pid": 7, "tid": 2, "name": "b", "ts": 0, "dur": 10},
    ]
    ops, busy = parse_device_ops(_write_trace(tmp_path, events))
    assert busy == 20.0 and ops == {"a": 10.0, "b": 10.0}
