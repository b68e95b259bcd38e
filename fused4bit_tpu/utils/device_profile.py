"""Trace-based device timing: exact per-op durations from the TPU profiler.

The wall-clock protocols in :mod:`fused4bit_tpu.utils.benchmark` fight this
platform's host-side noise (virtualized runtime bookkeeping of ~3 ms per scan
step, multi-second dispatch hiccups) with slope/chaining constructions — and
round-4 replication showed even the chained slope has 2-4x trial-to-trial
variance (`benchmark/results/kernel_tile_ab.json`). The profiler sidesteps
all of it: ``jax.profiler.trace`` records every XLA op's *device* start and
duration (picosecond fields in the exported Chrome trace), so one traced run
yields exact on-device times, immune to dispatch jitter by construction.

This is the TPU analogue of the reference's `torch.cuda.Event` timing
(`/root/reference/benchmark/run_benchmark.py:93-104`): both read the
device's own clock around the kernel rather than the host's.

Usage::

    from fused4bit_tpu.utils.device_profile import device_op_times

    prof = device_op_times(lambda: jax.block_until_ready(f(x, w)))
    prof.total_ms              # sum of all device op durations
    prof.by_op                 # {op name: OpTime(total_ms, count)}
    prof.matching_ms("fusion") # sum over ops whose name contains "fusion"
"""
from __future__ import annotations

import dataclasses
import glob
import gzip
import json
import os
import tempfile
from typing import Callable, Dict, Optional

import jax

__all__ = ["OpTime", "DeviceProfile", "device_op_times"]


@dataclasses.dataclass
class OpTime:
    total_ms: float
    count: int

    @property
    def mean_ms(self) -> float:
        return self.total_ms / max(self.count, 1)


@dataclasses.dataclass
class DeviceProfile:
    """Per-op device durations from one traced run."""

    by_op: Dict[str, OpTime]
    #: XLA-module (whole jit executable) device durations, keyed by module
    #: name — wall time per dispatch as the device saw it, including gaps
    #: between ops inside the module.
    by_module: Dict[str, OpTime]

    @property
    def total_ms(self) -> float:
        return sum(t.total_ms for t in self.by_op.values())

    def matching_ms(self, *substrings: str) -> float:
        """Total device ms over ops whose name contains any substring."""
        return sum(
            t.total_ms
            for name, t in self.by_op.items()
            if any(s in name for s in substrings)
        )

    def matching_count(self, *substrings: str) -> int:
        return sum(
            t.count
            for name, t in self.by_op.items()
            if any(s in name for s in substrings)
        )

    def main_module_ms(self, name_substring: Optional[str] = None) -> float:
        """Device ms of the main XLA module in this trace.

        A traced run can emit auxiliary modules besides the jit under test
        (donation copies, helper jits); ``min`` over all modules would then
        silently report the cheapest one. With ``name_substring`` the module
        is selected by name (e.g. ``"jit_loop"``); otherwise the
        max-total-duration module is taken — the main executable dominates
        and auxiliary transfer modules are orders of magnitude smaller.
        """
        if not self.by_module:
            raise RuntimeError("trace contains no XLA module events")
        if name_substring is not None:
            hits = {
                k: v for k, v in self.by_module.items() if name_substring in k
            }
            if not hits:
                raise KeyError(
                    f"no XLA module matching {name_substring!r}; "
                    f"have {sorted(self.by_module)}"
                )
            return max(v.total_ms for v in hits.values())
        return max(v.total_ms for v in self.by_module.values())


def _parse_trace(trace_dir: str) -> DeviceProfile:
    paths = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not paths:
        raise RuntimeError(f"no trace produced under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    evs = tr.get("traceEvents", [])
    device_pids = set()
    thread_names: Dict[tuple, str] = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            if "/device:" in e["args"].get("name", ""):
                device_pids.add(e["pid"])
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    by_op: Dict[str, OpTime] = {}
    by_module: Dict[str, OpTime] = {}
    for e in evs:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        # dur is in microseconds; device_duration_ps (when present) is exact
        dur_ms = float(
            e.get("args", {}).get("device_duration_ps", e["dur"] * 1e6)
        ) / 1e9
        # collapse .N suffixes so unrolled copies of one op aggregate
        name = e["name"].rsplit("(", 1)[0]
        base = name.rsplit(".", 1)
        if len(base) == 2 and base[1].isdigit():
            name = base[0]
        bucket = by_module if tname == "XLA Modules" else by_op
        if tname in ("XLA Modules", "XLA Ops"):
            t = bucket.setdefault(name, OpTime(0.0, 0))
            t.total_ms += dur_ms
            t.count += 1
    return DeviceProfile(by_op=by_op, by_module=by_module)


def device_op_times(
    run: Callable[[], object],
    *,
    trace_dir: Optional[str] = None,
) -> DeviceProfile:
    """Run ``run()`` under the profiler and return per-op device durations.

    ``run`` must block until the device work is done (end in
    ``jax.block_until_ready``/``np.asarray`` of a result); compile outside
    (call once before) so the trace holds only execution.
    """
    d = trace_dir or tempfile.mkdtemp(prefix="f4b_trace_")
    with jax.profiler.trace(d):
        run()
    return _parse_trace(d)
