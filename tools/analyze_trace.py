#!/usr/bin/env python3
"""XPlane trace analyzer: top device ops by self-time, with shapes.

Completes the tracing/profiling subsystem (SURVEY §5 — the reference has no
profiling at all): tools/profile_train.py captures an XPlane trace; this tool
aggregates the TPU device plane into a per-op table so a regression or a
layout problem (e.g. the r4 64MB copy-start) can be attributed to a specific
HLO op without TensorBoard (whose plugin converter is incompatible with this
TF build — the proto import below is the only working path in this image).

  python tools/analyze_trace.py /tmp/fm3dgan_trace [--top 30] [--match copy]

Output: one line per op name — total time, count, and (when present) the
shape / provenance stats XLA attaches to the event metadata.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
from collections import defaultdict


def load_xspace(trace_dir: str):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    pbs = sorted(
        glob.glob(
            os.path.join(trace_dir, "plugins", "profile", "*", "*.xplane.pb")
        )
    )
    if not pbs:
        raise FileNotFoundError(f"no *.xplane.pb under {trace_dir}")
    space = xplane_pb2.XSpace()
    with open(pbs[-1], "rb") as f:
        space.ParseFromString(f.read())
    return space, pbs[-1]


def _stat_value(stat, stat_md):
    for field in ("int64_value", "uint64_value", "double_value"):
        if stat.HasField(field):
            return getattr(stat, field)
    if stat.HasField("str_value"):
        return stat.str_value
    if stat.HasField("ref_value"):
        return stat_md[stat.ref_value].name
    return None


def aggregate_plane(plane):
    """name -> {total_ps, count, stats(dict of last-seen event stats)}."""
    ev_md = plane.event_metadata
    stat_md = plane.stat_metadata
    table = defaultdict(lambda: {"total_ps": 0, "count": 0, "stats": {}})
    for line in plane.lines:
        for ev in line.events:
            md = ev_md[ev.metadata_id]
            name = md.display_name or md.name
            rec = table[name]
            rec["total_ps"] += ev.duration_ps
            rec["count"] += 1
            for stat in ev.stats:
                key = stat_md[stat.metadata_id].name
                rec["stats"][key] = _stat_value(stat, stat_md)
            # Metadata-level stats (shape, provenance) ride the XEventMetadata.
            for stat in md.stats:
                key = stat_md[stat.metadata_id].name
                rec["stats"][key] = _stat_value(stat, stat_md)
    return table


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("trace_dir")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--match", default=None,
                   help="only ops whose name contains this substring")
    p.add_argument("--plane", default="TPU",
                   help="substring of the device plane name (default TPU; "
                        "use CPU for XLA-CPU traces)")
    p.add_argument("--json", action="store_true", help="emit JSON lines")
    args = p.parse_args()

    space, path = load_xspace(args.trace_dir)
    print(f"# {path}", file=sys.stderr)
    planes = [pl for pl in space.planes if args.plane.lower() in pl.name.lower()]
    if not planes:
        print("# available planes:", [pl.name for pl in space.planes],
              file=sys.stderr)
        sys.exit(1)
    for plane in planes:
        table = aggregate_plane(plane)
        # Category rollup first: fusion-soup traces (hundreds of sub-3ms
        # fusions) are only diagnosable at this altitude.
        by_cat = defaultdict(lambda: [0, 0])
        for name, rec in table.items():
            cat = rec["stats"].get("hlo_category") or (
                "copy" if "copy" in name else
                "convolution" if "conv" in name or "%conv" in name else
                "fusion" if "fusion" in name else "other"
            )
            by_cat[str(cat)][0] += rec["total_ps"]
            by_cat[str(cat)][1] += rec["count"]
        print("## by hlo_category (ms, count):", file=sys.stderr)
        for cat, (ps, cnt) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
            print(f"  {ps / 1e9:9.2f} ms x{cnt:<5d} {cat}", file=sys.stderr)
        rows = sorted(
            table.items(), key=lambda kv: -kv[1]["total_ps"]
        )
        if args.match:
            rows = [r for r in rows if args.match.lower() in r[0].lower()]
        total_ms = sum(v["total_ps"] for _, v in table.items()) / 1e9
        print(f"## plane {plane.name}: {len(table)} ops, "
              f"{total_ms:.1f} ms total event time", file=sys.stderr)
        for name, rec in rows[: args.top]:
            ms = rec["total_ps"] / 1e9
            if args.json:
                print(json.dumps({"op": name, "ms": round(ms, 3),
                                  "count": rec["count"], **{
                                      k: v for k, v in rec["stats"].items()
                                      if isinstance(v, (str, int, float))
                                  }}))
            else:
                interesting = {
                    k: v for k, v in rec["stats"].items()
                    if k in ("shape", "tf_op", "hlo_category", "long_name",
                             "memory_bandwidth_gbps", "bytes_accessed")
                }
                print(f"{ms:9.3f} ms x{rec['count']:<4d} {name}  "
                      f"{interesting if interesting else ''}")


if __name__ == "__main__":
    main()
