"""Summarize a jax.profiler xplane.pb: per-op device time, grouped.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/xplane_summary.py <xplane.pb> [top_n]
Needs tensorflow's bundled tsl xplane proto (pure-python protobuf parse).
"""

from __future__ import annotations

import collections
import re
import sys


def load(path):
    sys.path.insert(0, "/opt/venv/lib/python3.12/site-packages/tensorflow")
    from tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())
    return xs


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    xs = load(path)
    for plane in xs.planes:
        if "TPU" not in plane.name or not plane.lines:
            continue
        ev_names = plane.event_metadata
        per_op = collections.Counter()
        per_op_count = collections.Counter()
        line_totals = {}
        for line in plane.lines:
            span = 0
            for ev in line.events:
                name = ev_names[ev.metadata_id].name
                per_op[(line.name, name)] += ev.duration_ps
                per_op_count[(line.name, name)] += 1
                span += ev.duration_ps
            line_totals[line.name] = span
        print(f"== plane {plane.name}")
        for lname, tot in line_totals.items():
            print(f"  line {lname}: {tot/1e9:.3f} ms total")
        # group fusions by their root op name
        grouped = collections.Counter()
        for (lname, name), ps in per_op.items():
            # exact match: "Async XLA Ops" events overlap compute and would
            # drown the critical-path ranking
            if lname != "XLA Ops":
                continue
            # "%mlp.70 = (...) custom-call(...)" → family "mlp"
            sym = name.split(" = ")[0].strip().lstrip("%")
            root = re.sub(r"\.\d+$", "", sym)
            grouped[(lname, root)] += ps
        print(f"-- top {top_n} ops --")
        for (lname, name), ps in grouped.most_common(top_n):
            print(f"  {ps/1e9:9.3f} ms  [{lname}] {name}")


if __name__ == "__main__":
    main()
