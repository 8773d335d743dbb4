"""Join trace leaf-op durations with HLO metadata -> time per source location."""
import glob
import gzip
import json
import re
from collections import defaultdict

# name -> (file, line, opname) from the optimized HLO dump
src = {}
pat = re.compile(
    r"%?([\w.\-]+) = .*?metadata=\{([^}]*)\}")
fpat = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
opat = re.compile(r'op_name="([^"]+)"')
for line in open("/tmp/step_hlo.txt"):
    m = pat.search(line)
    if not m:
        continue
    name, meta = m.groups()
    fm = fpat.search(meta)
    om = opat.search(meta)
    loc = f"{fm.group(1).split('/')[-1]}:{fm.group(2)}" if fm else "?"
    src[name] = (loc, om.group(1) if om else "?")

files = sorted(glob.glob("/tmp/jax_trace/**/*.trace.json.gz", recursive=True))
with gzip.open(files[-1], "rt") as f:
    trace = json.load(f)
events = trace["traceEvents"]
tid_names = {}
pid_names = {}
for e in events:
    if e.get("ph") == "M":
        if e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
        if e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
want = [k for k, v in tid_names.items()
        if v == "XLA Ops" and "TPU" in pid_names.get(k[0], "")]
STEPS = 10
by_loc = defaultdict(float)
by_mod = defaultdict(float)
unattr = defaultdict(float)
for e in events:
    if e.get("ph") == "X" and (e["pid"], e.get("tid")) in want:
        nm = e.get("name", "")
        d = e.get("dur", 0)
        info = src.get(nm) or src.get(nm.split("(")[0])
        if info:
            loc, op = info
            by_loc[(loc, op[:60])] += d
            # module grouping from op_name path
            mod = "model" if "OdometryModel" in op else (
                "projection" if "projection.py" in loc else
                "matcher" if ("correspond" in loc or "window_match" in loc or "pallas" in nm) else
                "losses" if "icp" in loc else
                "adam" if ("transform" in op or "adam" in op or "optax" in loc or "state.py" in loc) else
                "se3" if "se3.py" in loc else loc.split(":")[0])
            by_mod[mod] += d
        else:
            unattr[nm] += d

print("== by module (ms/step) ==")
for k, v in sorted(by_mod.items(), key=lambda kv: -kv[1]):
    print(f"{v/1e3/STEPS:8.3f}  {k}")
print(f"{sum(unattr.values())/1e3/STEPS:8.3f}  UNATTRIBUTED")
print("\n== top source locations ==")
for (loc, op), v in sorted(by_loc.items(), key=lambda kv: -kv[1])[:30]:
    print(f"{v/1e3/STEPS:8.3f}  {loc:42s} {op}")
print("\n== top unattributed ==")
for nm, v in sorted(unattr.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{v/1e3/STEPS:8.3f}  {nm}")
