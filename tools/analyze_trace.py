"""Aggregate a captured jax.profiler xplane trace by named-scope component.

Maps each XLA-Ops event to its HLO instruction's metadata.op_name (which
carries jax.named_scope paths), then buckets device time by the scope path.
Usage: python tools/analyze_trace.py /tmp/bench_trace [n_steps]
"""
import collections
import glob
import sys

from tensorflow.tsl.profiler.protobuf import xplane_pb2
from tensorflow.compiler.xla.service import hlo_pb2


def load(trace_dir):
    path = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    return xs


def hlo_op_names(xs):
    """instruction name -> metadata.op_name from the embedded HLO protos."""
    out = {}
    for plane in xs.planes:
        if plane.name != "/host:metadata":
            continue
        for sm in plane.stat_metadata.values():
            pass
        for line in plane.lines:
            pass
        # Hlo Proto lives in plane stats? events? -> check XLA Modules instead
    return out


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_trace"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    xs = load(trace_dir)

    # HLO protos: stored as bytes in stat values of the metadata plane
    name_to_op = {}
    for plane in xs.planes:
        if plane.name != "/host:metadata":
            continue
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        for line in plane.lines:
            for ev in line.events:
                for st in ev.stats:
                    if stat_names.get(st.metadata_id) == "Hlo Proto":
                        hp = hlo_pb2.HloProto()
                        hp.ParseFromString(st.bytes_value)
                        for comp in hp.hlo_module.computations:
                            for inst in comp.instructions:
                                if inst.metadata.op_name:
                                    name_to_op[inst.name] = inst.metadata.op_name
    print(f"hlo instructions with op_name: {len(name_to_op)}", file=sys.stderr)

    for plane in xs.planes:
        if plane.name != "/device:TPU:0":
            continue
        stat_names = {m.id: m.name for m in plane.stat_metadata.values()}
        ev_meta = {m.id: m.name for m in plane.event_metadata.values()}
        by_scope = collections.Counter()
        by_cat = collections.Counter()
        by_name = collections.Counter()
        total = 0.0
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                dur = ev.duration_ps / 1e12
                name = ev_meta.get(ev.metadata_id, "?").lstrip("%")
                cat = ""
                for st in ev.stats:
                    sn = stat_names.get(st.metadata_id)
                    if sn == "hlo_category":
                        cat = st.str_value or stat_names.get(st.ref_value, "")
                op = name_to_op.get(name.split(" ")[0], "")
                # scope = first two named_scope components after jit(...)
                parts = [p for p in op.split("/") if p and not p.startswith("jit(")]
                scope = "/".join(parts[:2]) if parts else f"<{cat or name.split('.')[0]}>"
                by_scope[scope] += dur
                by_cat[cat or "?"] += dur
                by_name[name.split(" ")[0]] += dur
                total += dur
        ms = 1e3 / n_steps
        print(f"device total: {total*ms:.1f} ms/step")
        print("\n--- by scope (top 30) ---")
        for s, t in by_scope.most_common(30):
            print(f"{t*ms:9.2f} ms/step  {s[:100]}")
        print("\n--- by hlo category ---")
        for s, t in by_cat.most_common(15):
            print(f"{t*ms:9.2f} ms/step  {s}")
        print("\n--- top individual ops ---")
        for s, t in by_name.most_common(15):
            print(f"{t*ms:9.2f} ms/step  {s[:90]}")


if __name__ == "__main__":
    main()
