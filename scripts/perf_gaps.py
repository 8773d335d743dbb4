"""Find the largest inter-op gaps on the device XLA Ops timeline."""
import glob
import gzip
import json
from collections import defaultdict

files = sorted(glob.glob("/tmp/jax_trace/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
tid_names, pid_names = {}, {}
for e in events:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
want = [k for k, v in tid_names.items()
        if v == "XLA Ops" and "TPU" in pid_names.get(k[0], "")]
ops = sorted(
    (e for e in events
     if e.get("ph") == "X" and (e["pid"], e.get("tid")) in want),
    key=lambda e: e["ts"],
)
gaps = defaultdict(float)
gapn = defaultdict(int)
prev_end = None
prev_name = ""
for e in ops:
    if prev_end is not None and e["ts"] > prev_end + 1:  # >1us gap
        key = (prev_name[:40], e["name"][:40])
        gaps[key] += e["ts"] - prev_end
        gapn[key] += 1
    prev_end = max(prev_end or 0, e["ts"] + e.get("dur", 0))
    prev_name = e["name"]
print("total gap:", sum(gaps.values()) / 1e3 / 10, "ms/step")
for key, v in sorted(gaps.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{v/1e3/10:8.3f} ms x{gapn[key]//10:3d}  after {key[0]!r} before {key[1]!r}")
