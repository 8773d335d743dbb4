"""Analyze an already-captured jax.profiler perfetto trace: per-thread
breakdown, then leaf-op aggregation on the 'XLA Ops' thread by category."""
import glob
import gzip
import json
import sys
from collections import defaultdict

files = sorted(glob.glob("/tmp/jax_trace/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]

pid_names, tid_names = {}, {}
for e in events:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        elif e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

by_thread = defaultdict(float)
cnt_thread = defaultdict(int)
for e in events:
    if e.get("ph") == "X":
        key = (e["pid"], e.get("tid"))
        by_thread[key] += e.get("dur", 0)
        cnt_thread[key] += 1
print("== threads ==")
for key, d in sorted(by_thread.items(), key=lambda kv: -kv[1])[:12]:
    print(f"{d/1e3:10.2f} ms total x{cnt_thread[key]:6d}  pid={pid_names.get(key[0],'?'):18s} tid={tid_names.get(key,'?')}")

# leaf ops: pick the busiest device thread that is NOT a module/step parent
STEPS = 10
want = None
for key, _ in sorted(by_thread.items(), key=lambda kv: -kv[1]):
    name = tid_names.get(key, "")
    if "XLA Op" in name or "Ops" in name:
        want = key
        break
if want is None:
    sys.exit("no XLA Ops thread found")
print(f"\n== leaf ops on {tid_names[want]} ==")
tot = defaultdict(float)
cnt = defaultdict(int)
for e in events:
    if e.get("ph") == "X" and (e["pid"], e.get("tid")) == want:
        tot[e.get("name", "")] += e.get("dur", 0)
        cnt[e.get("name", "")] += 1
grand = sum(tot.values())
print(f"total {grand/1e3/STEPS:.2f} ms/step")
for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{d/1e3/STEPS:9.3f} ms x{cnt[name]//STEPS:5d}  {name[:100]}")

# category rollup by prefix
def cat(n):
    base = n.split("(")[0].split(".")[0]
    for p in ("fusion", "while", "sort", "dynamic-slice", "convolution",
              "copy", "pad", "select_and_scatter", "transpose", "reduce",
              "concatenate", "dot", "custom-call", "bitcast", "broadcast",
              "scatter", "gather", "iota", "constant", "all-reduce", "rng"):
        if base.startswith(p) or p in base:
            return p
    if "window_match" in n or "pallas" in n:
        return "pallas-matcher"
    return base[:30]

cats = defaultdict(float)
for name, d in tot.items():
    cats[cat(name)] += d
print("\n== categories ==")
for name, d in sorted(cats.items(), key=lambda kv: -kv[1])[:20]:
    print(f"{d/1e3/STEPS:9.3f} ms  {name}")
