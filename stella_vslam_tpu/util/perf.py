"""Standing per-stage timing accumulators for the SLAM pipeline.

The reference publishes per-frame extraction + tracking wall times
(system.cc:540-543,578-583; frame_publisher.h:107-112) and the CI consumes
them as track_times.txt. This module goes further: every pipeline stage —
the tracker's feed/dispatch/finalize path and each segment of a mapper
keyframe event (cull, dispatch, grouped fetch, apply, local-BA assemble/
dispatch/writeback, redundancy culling, table publish) — records into one
process-global accumulator, so a run can print a budget of where keyframe
events and frame feeds actually spend their time.

Host wall time on this target is doubly meaningful: the host has ONE core,
so a millisecond of numpy/python on ANY thread (mapper, finalize, fetch
workers) is a millisecond stolen from the feed thread. The report therefore
splits segments by thread-role prefix: "feed/", "fin/", "map/", "ba/".

Overhead: one monotonic() pair + a dict update per segment (~1 us); always
on.
"""
from __future__ import annotations

import threading
import time
from contextlib import contextmanager


class PerfAccumulator:
    def __init__(self):
        self._lock = threading.Lock()
        self._seg = {}  # name -> [count, total_s, max_s]

    def add(self, name: str, dt: float):
        with self._lock:
            s = self._seg.get(name)
            if s is None:
                self._seg[name] = [1, dt, dt]
            else:
                s[0] += 1
                s[1] += dt
                if dt > s[2]:
                    s[2] = dt

    @contextmanager
    def timer(self, name: str):
        t0 = time.monotonic()
        try:
            yield
        finally:
            self.add(name, time.monotonic() - t0)

    def snapshot(self) -> dict:
        with self._lock:
            return {k: tuple(v) for k, v in self._seg.items()}

    def reset(self):
        with self._lock:
            self._seg.clear()

    def report(self, min_total_ms: float = 1.0) -> str:
        """Formatted budget table: name, count, total ms, mean ms, max ms —
        sorted by total descending, grouped by role prefix."""
        snap = self.snapshot()
        rows = [
            (k, c, tot * 1e3, tot * 1e3 / c, mx * 1e3)
            for k, (c, tot, mx) in snap.items()
            if tot * 1e3 >= min_total_ms
        ]
        rows.sort(key=lambda r: -r[2])
        if not rows:
            return "(no perf segments recorded)"
        w = max(len(r[0]) for r in rows)
        out = [f"{'segment':<{w}}  {'n':>6}  {'total ms':>9}  "
               f"{'mean':>7}  {'max':>7}"]
        for name, c, tot, mean, mx in rows:
            out.append(
                f"{name:<{w}}  {c:>6}  {tot:>9.0f}  {mean:>7.1f}  {mx:>7.1f}")
        return "\n".join(out)


PERF = PerfAccumulator()
