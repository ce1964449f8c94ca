"""Parse a jax.profiler xplane.pb capture directly — per-op device time table.

The installed tensorboard_plugin_profile's trace converter is incompatible
with this environment's TF (protobuf/pywrap mismatch, see PERF.md round-1
dead-ends), but the raw XSpace proto parses fine.  This tool loads the
generated ``xplane_pb2`` module by FILE PATH (importing tensorflow itself
costs ~20 s and drags in CUDA probing), walks the TPU device planes, and
aggregates XLA-op self-times into the table the plugin would have shown:

    python tools/xplane_profile.py /tmp/profile_dir [--top 40] [--by category]

Profile capture: run training with ``--profile_dir /tmp/profile_dir`` (see
main.py) or wrap any block in ``jax.profiler.trace(dir)``.  Reference has no
analog (it relies on nvprof externally); cited capability: SURVEY §5.1.
"""

from __future__ import annotations

import argparse
import collections
import glob
import importlib.util
import json
import os
import sys

_PB2 = "/opt/venv/lib/python3.12/site-packages/tensorflow/tsl/profiler/protobuf/xplane_pb2.py"


def load_xplane_pb2(path=_PB2):
    """Load the generated proto module standalone (no tensorflow import)."""
    spec = importlib.util.spec_from_file_location("xplane_pb2_standalone", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def find_xspaces(root):
    """All xplane.pb files under a profile logdir (plugins/profile/<run>/)."""
    pats = [
        os.path.join(root, "**", "*.xplane.pb"),
        os.path.join(root, "*.xplane.pb"),
    ]
    out = []
    for p in pats:
        out.extend(glob.glob(p, recursive=True))
    return sorted(set(out))


def stat_dict(msg, stat_md):
    """XStat list -> {name: value} using the plane's stat_metadata table."""
    d = {}
    for st in msg.stats:
        name = stat_md.get(st.metadata_id)
        if name is None:
            continue
        which = st.WhichOneof("value")
        d[name] = getattr(st, which) if which else None
    return d


class OpAgg:
    __slots__ = ("time_ps", "count", "category", "long_name")

    def __init__(self):
        self.time_ps = 0
        self.count = 0
        self.category = ""
        self.long_name = ""


def aggregate(xspace, device_only=True):
    """Aggregate event durations per op metadata over TPU device planes.

    Returns (per_op: {name: OpAgg}, plane_totals: {plane: (busy_ps, span_ps)}).
    On TPU planes each XLine is a core/step stream of XLA op events; events on
    the same line don't overlap, so summing durations per line gives busy time.
    """
    per_op = {}
    plane_totals = {}
    for plane in xspace.planes:
        is_dev = plane.name.startswith("/device:TPU") or "TPU" in plane.name
        if device_only and not is_dev:
            continue
        ev_md = {k: v for k, v in plane.event_metadata.items()}
        stat_md = {k: v.name for k, v in plane.stat_metadata.items()}
        busy = 0
        span = 0
        for line in plane.lines:
            line_busy = 0
            t_min, t_max = None, 0
            for ev in line.events:
                md = ev_md.get(ev.metadata_id)
                name = md.name if md else f"op#{ev.metadata_id}"
                agg = per_op.get(name)
                if agg is None:
                    agg = per_op[name] = OpAgg()
                    if md is not None:
                        sd = stat_dict(md, stat_md)
                        agg.category = str(sd.get("hlo_category", sd.get("category", "")))
                        agg.long_name = str(sd.get("long_name", ""))[:160]
                agg.time_ps += ev.duration_ps
                agg.count += 1
                line_busy += ev.duration_ps
                off = ev.offset_ps
                t_min = off if t_min is None else min(t_min, off)
                t_max = max(t_max, off + ev.duration_ps)
            busy = max(busy, line_busy)  # per-core busy; cores run concurrently
            if t_min is not None:
                span = max(span, t_max - t_min)
        if plane.lines:
            plane_totals[plane.name] = (busy, span)
    return per_op, plane_totals


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("logdir", help="profile dir (searched recursively) or xplane.pb file")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["op", "category", "source"], default="op",
                    help="source: aggregate by the source_file:line HLO "
                         "metadata embedded in op names")
    ap.add_argument("--json", action="store_true", help="machine-readable output")
    ap.add_argument("--host", action="store_true", help="include host planes too")
    args = ap.parse_args(argv)

    pb2 = load_xplane_pb2()
    files = [args.logdir] if args.logdir.endswith(".pb") else find_xspaces(args.logdir)
    if not files:
        print(f"no xplane.pb under {args.logdir}", file=sys.stderr)
        return 2

    per_op = {}
    plane_totals = {}
    for f in files:
        xs = pb2.XSpace()
        with open(f, "rb") as fh:
            xs.ParseFromString(fh.read())
        po, pt = aggregate(xs, device_only=not args.host)
        for k, v in po.items():
            if k in per_op:
                per_op[k].time_ps += v.time_ps
                per_op[k].count += v.count
            else:
                per_op[k] = v
        plane_totals.update(pt)

    if args.by == "category":
        cats = collections.Counter()
        for v in per_op.values():
            cats[v.category or "uncategorized"] += v.time_ps
        rows = [(c, t, None) for c, t in cats.most_common(args.top)]
    elif args.by == "source":
        import re

        src_re = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
        srcs = collections.Counter()
        for name, v in per_op.items():
            m = src_re.search(name) or src_re.search(v.long_name or "")
            if m:
                key = f"{m.group(1).split('/')[-1]}:{m.group(2)} [{v.category}]"
            elif v.category:
                key = f"<no-source> [{v.category}]"
            else:
                continue  # step/region marker events, not ops
            srcs[key] += v.time_ps
        rows = [(c, t, None) for c, t in srcs.most_common(args.top)]
    else:
        srt = sorted(per_op.items(), key=lambda kv: -kv[1].time_ps)[: args.top]
        rows = [(k, v.time_ps, v) for k, v in srt]

    total_ps = sum(v.time_ps for v in per_op.values()) or 1
    if args.json:
        print(json.dumps({
            "files": files,
            "planes": {k: {"busy_ms": b / 1e9, "span_ms": s / 1e9}
                       for k, (b, s) in plane_totals.items()},
            "rows": [{"name": n, "ms": t / 1e9, "pct": 100 * t / total_ps,
                      "count": getattr(v, "count", None),
                      "category": getattr(v, "category", "")} for n, t, v in rows],
        }))
        return 0

    for pn, (b, s) in plane_totals.items():
        print(f"plane {pn}: busy {b / 1e9:.2f} ms  span {s / 1e9:.2f} ms")
    print(f"{'time_ms':>10} {'pct':>6} {'count':>7}  name [category]")
    for name, t, v in rows:
        cnt = getattr(v, "count", "") if v else ""
        cat = f" [{v.category}]" if v and v.category else ""
        print(f"{t / 1e9:10.2f} {100 * t / total_ps:5.1f}% {cnt:>7}  {name}{cat}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
