"""Summarize a jax.profiler trace dir: per-HLO-category device time and the
top (category, shape, source) rows. This is the tool behind PERF.md's
op-level decompositions (round 3): point it at the dir passed to
jax.profiler.trace(...) after running one MC-ensemble dispatch.

Usage: python scripts/analyze_trace.py TRACE_DIR [DIVISOR]
DIVISOR (default 32) converts total device time to ms/pass for an
ensemble of that many members.

The `pid == 3` filter selects the TPU device-stream track in the xplane
export of this jax version (host/python tracks use other pids); verify
with a new jax by eyeballing the trace.json.gz track names.
"""
import collections
import glob
import gzip
import json
import re
import sys

d = sys.argv[1]
passes = int(sys.argv[2]) if len(sys.argv) > 2 else 32
f = glob.glob(d + "/plugins/profile/*/*.trace.json.gz")[0]
with gzip.open(f) as fh:
    tr = json.load(fh)
ev = tr["traceEvents"] if isinstance(tr, dict) else tr
dev = [e for e in ev
       if e.get("pid") == 3 and e.get("ph") == "X"
       and not e["name"].startswith("jit_")]
total = sum(e["dur"] for e in dev)
print(f"{d}: total {total/1e3:.1f} ms "
      f"({total/passes/1e3:.3f} ms/pass) over {len(dev)} ops")


def shape_of(ln):
    m = re.match(r"%\S+ = \(?((?:[a-z0-9]+\[[^\]]*\]))", ln or "")
    return m.group(1) if m else "?"


rows = collections.defaultdict(lambda: [0.0, 0])
bycat = collections.Counter()
for e in dev:
    a = e.get("args", {})
    cat = a.get("hlo_category", "?")
    bycat[cat] += e["dur"]
    src = a.get("source", "?")
    src = src.split("/")[-1] if src else "?"
    rows[(cat, shape_of(a.get("long_name", "")), src)][0] += e["dur"]
    rows[(cat, shape_of(a.get("long_name", "")), src)][1] += 1
for c, us in bycat.most_common(10):
    print(f"  {us/1e3:8.2f} ms {100*us/total:5.1f}%  {c}")
print("  -- top rows --")
for (cat, shp, src), (us, n) in sorted(rows.items(),
                                       key=lambda kv: -kv[1][0])[:25]:
    print(f"  {us/1e3:8.2f} ms x{n:3d} {cat[:16]:16s} {shp[:42]:42s} "
          f"{src[:30]}")
