"""Profiling harness: capture a ``jax.profiler`` trace and attribute device
time to model components.

The reference repo has no profiler integration at all (its perf story is
nvidia-smi + wall clocks around detectron2's ``SimpleTrainer``); here tracing
is a first-class library surface: ``trace_steps`` wraps any step callable,
and ``summarize_trace`` parses the raw ``*.xplane.pb`` (the tensorboard
converter has a protobuf mismatch in common images, so the proto is read
directly) and buckets per-op device time by ``jax.named_scope`` /
HLO-metadata source paths.
"""

from __future__ import annotations

import collections
import glob
import os
from typing import Callable, Dict, Optional

__all__ = ["trace_steps", "summarize_trace"]


def trace_steps(step_fn: Callable[[], None], trace_dir: str,
                steps: int = 3, warmup: int = 1) -> str:
    """Run ``step_fn`` ``warmup`` times untraced, then ``steps`` times under
    ``jax.profiler.trace``. Returns ``trace_dir``."""
    import jax

    for _ in range(warmup):
        step_fn()
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(steps):
            step_fn()
    return trace_dir


def summarize_trace(trace_dir: str, steps: int = 3,
                    scope_depth: int = 4,
                    hlo_text: Optional[str] = None,
                    kind_filter: Optional[tuple] = None,
                    return_detail: bool = False) -> Dict[str, float]:
    """Aggregate per-op device time (ms/step) from a captured trace.

    Buckets by the op's HLO ``op_name`` metadata (carries jax.named_scope
    paths) when ``hlo_text`` (the compiled module's ``as_text()``) is given;
    otherwise by the event name's op kind. ``copy-start``/``slice-start``
    events are skipped — they are asynchronous prefetches whose duration
    spans the program, not real cost.

    ``kind_filter``: restrict to events whose HLO op name starts with one of
    the given kinds (e.g. ``("fusion",)`` decomposes the generic fusion tail
    by owning scope, ``("copy", "transpose")`` localizes layout copies).
    ``return_detail``: also return ``{scope: {op_kind: ms}}`` so each
    scope's cost splits by op kind.
    """
    from tensorflow.tsl.profiler.protobuf import xplane_pb2  # type: ignore

    opname = {}
    if hlo_text:
        import re

        pat = re.compile(r'%([\w.\-]+) = .*metadata=\{op_name="([^"]+)"')
        for line in hlo_text.splitlines():
            m = pat.search(line)
            if m:
                opname[m.group(1)] = m.group(2)

    agg: collections.Counter = collections.Counter()
    cpu_agg: collections.Counter = collections.Counter()
    for p in glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                       recursive=True):
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            ev_names = {m.id: m.name for m in plane.event_metadata.values()}
            if "TPU" in plane.name:
                for ln in plane.lines:
                    # sync ops only: "Async XLA Ops" DMAs overlap compute and
                    # would double-count against the step wall time
                    if ln.name != "XLA Ops":
                        continue
                    for ev in ln.events:
                        agg[ev_names.get(ev.metadata_id, "?")] += (
                            ev.duration_ps / 1e9 / max(steps, 1))
            elif plane.name == "/host:CPU":
                # CPU backend traces have thread timelines, not per-HLO-op
                # lines — bucket by event name as a coarse fallback
                for ln in plane.lines:
                    for ev in ln.events:
                        cpu_agg[ev_names.get(ev.metadata_id, "?")] += (
                            ev.duration_ps / 1e9 / max(steps, 1))
    if not agg:
        agg = cpu_agg

    bucket: collections.Counter = collections.Counter()
    detail: Dict[str, collections.Counter] = collections.defaultdict(
        collections.Counter)
    for op, ms in agg.items():
        if op.startswith(("copy-start", "slice-start")):
            continue
        base = op.split(" ")[0].lstrip("%")
        kind = base.split(".")[0].rstrip("0123456789_-")
        if kind_filter is not None and not kind.startswith(tuple(kind_filter)):
            continue
        name = opname.get(base, "")
        if name:
            scope = "/".join(name.split("/")[:scope_depth])
        else:
            scope = "<" + kind + ">"
        bucket[scope] += ms
        detail[scope][kind] += ms
    out = dict(bucket.most_common())
    if return_detail:
        return out, {k: dict(v.most_common()) for k, v in detail.items()}
    return out
