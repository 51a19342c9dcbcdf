"""Aggregate XLA op durations from a jax.profiler xplane.pb.

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/xplane_ops.py <xplane.pb> [top_n]
"""
import sys
from collections import defaultdict

from tensorflow.tsl.profiler.protobuf import xplane_pb2

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

xs = xplane_pb2.XSpace()
xs.ParseFromString(open(path, "rb").read())

for p in xs.planes:
    if "TPU" not in p.name and "/device" not in p.name.lower():
        continue
    # line named "XLA Ops" (or similar) carries per-op events
    stats_meta = {k: v.name for k, v in p.stat_metadata.items()}
    ev_meta = {k: v.name for k, v in p.event_metadata.items()}
    agg = defaultdict(lambda: [0, 0])  # name -> [total_ps, count]
    line_names = []
    for line in p.lines:
        line_names.append((line.name, len(line.events)))
        if line.name not in ("XLA Ops", "XLA Modules", "Steps", "XLA TraceMe",
                             "Framework Ops"):
            pass
        for ev in line.events:
            name = ev_meta.get(ev.metadata_id, "?")
            key = (line.name, name)
            agg[key][0] += ev.duration_ps
            agg[key][1] += 1
    print(f"== plane: {p.name}; lines: {line_names}")
    by_line = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for (ln, name), (ps, cnt) in agg.items():
        by_line[ln][name][0] += ps
        by_line[ln][name][1] += cnt
    for ln, ops in by_line.items():
        total = sum(v[0] for v in ops.values())
        print(f"-- line '{ln}': total {total/1e9:.1f} ms over {sum(v[1] for v in ops.values())} events")
        rows = sorted(ops.items(), key=lambda kv: -kv[1][0])[:top_n]
        for name, (ps, cnt) in rows:
            print(f"   {ps/1e9:9.2f} ms  x{cnt:<6d} {name[:110]}")
