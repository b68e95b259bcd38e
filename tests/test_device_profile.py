"""Tests for the trace-based device timing utility (utils/device_profile).

The parser is exercised against a synthetic Chrome-trace fixture shaped like
the real TPU profiler export (device pid with "XLA Modules"/"XLA Ops"
threads, picosecond duration args), so the test runs anywhere. On a real
chip the same parser backs benchmark/probe_device_bw.py.
"""
import gzip
import json
import os

import pytest

from fused4bit_tpu.utils.device_profile import _parse_trace


def _write_trace(tmp_path, events):
    d = os.path.join(tmp_path, "plugins", "profile", "2026_01_01_00_00_00")
    os.makedirs(d)
    with gzip.open(os.path.join(d, "vm.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(tmp_path)


def _meta(pid, name, tid=None, tname=None):
    evs = [{"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": name}}]
    if tid is not None:
        evs.append({"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
                    "args": {"name": tname}})
    return evs


def test_parse_aggregates_device_ops(tmp_path):
    events = (
        _meta(3, "/device:TPU:0", 2, "XLA Modules")
        + _meta(701, "/host:CPU", 1, "python")
        + [
            {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
             "args": {"name": "XLA Ops"}},
            # module event: 1.5 ms via picosecond field
            {"ph": "X", "pid": 3, "tid": 2, "ts": 0.0, "dur": 1500.0,
             "name": "jit_f(123)",
             "args": {"device_duration_ps": str(1_500_000_000)}},
            # two unroll-suffixed instances of one op: 0.2 + 0.3 ms
            {"ph": "X", "pid": 3, "tid": 3, "ts": 0.0, "dur": 200.0,
             "name": "my_kernel.1",
             "args": {"device_duration_ps": str(200_000_000)}},
            {"ph": "X", "pid": 3, "tid": 3, "ts": 300.0, "dur": 300.0,
             "name": "my_kernel.2",
             "args": {"device_duration_ps": str(300_000_000)}},
            # op without ps field falls back to microsecond dur
            {"ph": "X", "pid": 3, "tid": 3, "ts": 700.0, "dur": 50.0,
             "name": "pad"},
            # host event must be ignored
            {"ph": "X", "pid": 701, "tid": 1, "ts": 0.0, "dur": 9999.0,
             "name": "PjitFunction(f)"},
        ]
    )
    prof = _parse_trace(_write_trace(tmp_path, events))

    assert prof.by_module["jit_f"].total_ms == pytest.approx(1.5)
    # .N suffixes collapse into one op entry
    assert prof.by_op["my_kernel"].count == 2
    assert prof.by_op["my_kernel"].total_ms == pytest.approx(0.5)
    assert prof.by_op["my_kernel"].mean_ms == pytest.approx(0.25)
    assert prof.by_op["pad"].total_ms == pytest.approx(0.05)
    assert "PjitFunction(f)" not in prof.by_op

    assert prof.matching_ms("my_kern") == pytest.approx(0.5)
    assert prof.matching_count("my_kern", "pad") == 3
    assert prof.total_ms == pytest.approx(0.55)


def test_parse_raises_without_trace(tmp_path):
    with pytest.raises(RuntimeError):
        _parse_trace(str(tmp_path))


def test_main_module_selection(tmp_path):
    # main jit (2.0 ms) plus a cheap auxiliary transfer module (0.01 ms):
    # main_module_ms must NOT report the auxiliary one (min-over-modules bug)
    events = _meta(3, "/device:TPU:0", 2, "XLA Modules") + [
        {"ph": "X", "pid": 3, "tid": 2, "ts": 0.0, "dur": 2000.0,
         "name": "jit_loop(7)",
         "args": {"device_duration_ps": str(2_000_000_000)}},
        {"ph": "X", "pid": 3, "tid": 2, "ts": 2500.0, "dur": 10.0,
         "name": "jit__copy(9)",
         "args": {"device_duration_ps": str(10_000_000)}},
    ]
    prof = _parse_trace(_write_trace(tmp_path, events))
    assert prof.main_module_ms() == pytest.approx(2.0)
    assert prof.main_module_ms("jit_loop") == pytest.approx(2.0)
    with pytest.raises(KeyError):
        prof.main_module_ms("jit_nonexistent")
