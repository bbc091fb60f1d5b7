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


def test_parallel_module_and_step_lanes_not_double_counted(tmp_path):
    """A device pid carries parallel tid rows describing the SAME
    microseconds (Modules / Ops / Steps). With thread_name metadata,
    only the "XLA Ops" lane counts; separate device pids (cores) sum."""
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 7, "tid": 1, "name": "thread_name",
         "args": {"name": "Steps"}},
        {"ph": "M", "pid": 7, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 7, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 8, "name": "process_name",
         "args": {"name": "/device:TPU:1"}},
        {"ph": "M", "pid": 8, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # same 40us viewed on three lanes of pid 7
        {"ph": "X", "pid": 7, "tid": 1, "name": "2", "ts": 0, "dur": 40},
        {"ph": "X", "pid": 7, "tid": 2, "name": "jit_f", "ts": 0,
         "dur": 40},
        {"ph": "X", "pid": 7, "tid": 3, "name": "matmul", "ts": 0,
         "dur": 25},
        {"ph": "X", "pid": 7, "tid": 3, "name": "fusion", "ts": 25,
         "dur": 15},
        # a second core contributes its own op lane
        {"ph": "X", "pid": 8, "tid": 3, "name": "matmul", "ts": 0,
         "dur": 10},
    ]
    ops, busy = parse_device_ops(_write_trace(tmp_path, events))
    assert busy == 50.0                        # 40 (pid 7) + 10 (pid 8)
    assert ops == {"matmul": 35.0, "fusion": 15.0}


def test_unnamed_threads_fall_back_to_busiest_lane(tmp_path):
    events = [
        {"ph": "M", "pid": 7, "name": "process_name",
         "args": {"name": "TPU core 0"}},
        # module-ish lane: 1 big event; op-ish lane: 3 events
        {"ph": "X", "pid": 7, "tid": 1, "name": "jit_f", "ts": 0,
         "dur": 30},
        {"ph": "X", "pid": 7, "tid": 2, "name": "a", "ts": 0, "dur": 10},
        {"ph": "X", "pid": 7, "tid": 2, "name": "b", "ts": 10, "dur": 10},
        {"ph": "X", "pid": 7, "tid": 2, "name": "c", "ts": 20, "dur": 10},
    ]
    ops, busy = parse_device_ops(_write_trace(tmp_path, events))
    assert busy == 30.0
    assert ops == {"a": 10.0, "b": 10.0, "c": 10.0}
