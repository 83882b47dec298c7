"""Aggregate a jax.profiler trace: leaf-op device time by named_scope stage.

Usage: python /tmp/trace_analyze.py /tmp/jaxtrace
Reads the .trace.json.gz produced by jax.profiler.trace and aggregates leaf
device events (skipping container spans) by the named_scope prefix embedded
in the HLO op metadata, plus counts ops and inter-op gaps.
"""
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxtrace")
traces = sorted(root.rglob("*.trace.json.gz"), key=lambda p: p.stat().st_mtime)
assert traces, f"no trace under {root}"
tf = traces[-1]
with gzip.open(tf, "rt") as f:
    data = json.load(f)
ev = data["traceEvents"]

# find device lanes: pid whose process_name mentions TPU/device XLA Ops
names = {}
threads = {}
for e in ev:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
        if e.get("name") == "thread_name":
            threads[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

dev_pids = [p for p, n in names.items() if "TPU" in n or "/device" in n.lower()]
if not dev_pids:
    dev_pids = [p for p, n in names.items() if "XLA" in n]
print("processes:", {p: names[p] for p in names})

rows = []
for e in ev:
    if e.get("ph") != "X" or e.get("pid") not in dev_pids:
        continue
    tn = threads.get((e["pid"], e.get("tid")), "")
    if "XLA Ops" not in tn and "Ops" not in tn:
        continue
    nm = e.get("name", "")
    if nm.startswith("jit_") or nm in ("while", "body", "condition"):
        continue
    rows.append((e["ts"], e["dur"], nm, e.get("args", {})))

rows.sort()
total = sum(d for _, d, _, _ in rows)
# gaps between consecutive leaf ops
gaps = 0.0
for i in range(1, len(rows)):
    g = rows[i][0] - (rows[i - 1][0] + rows[i - 1][1])
    if 0 < g < 1e4:
        gaps += g
print(f"leaf ops: {len(rows)}  device-busy: {total/1e3:.2f} ms  gaps: {gaps/1e3:.2f} ms")

by_scope = defaultdict(lambda: [0.0, 0])
for _, d, nm, args in rows:
    scope = args.get("long_name", "") or args.get("tf_op", "") or nm
    # named_scope shows up as prefix path in metadata op_name
    key = args.get("op_name", "") or scope
    parts = key.split("/")
    lead = "/".join(parts[:2]) if len(parts) > 1 else (parts[0] or nm.split(".")[0])
    by_scope[lead][0] += d
    by_scope[lead][1] += 1
for k, (d, c) in sorted(by_scope.items(), key=lambda kv: -kv[1][0])[:40]:
    print(f"{d/1e3:9.3f} ms {c:5d} ops  {k}")
