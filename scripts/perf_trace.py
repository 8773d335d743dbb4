"""Capture a jax.profiler trace of the fullcached train step and print the
top device ops by total duration (parses the perfetto trace JSON directly —
no TensorBoard needed)."""
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from delora_tpu.models.odometry import ModelConfig, OdometryModel  # noqa: E402
from delora_tpu.ops.projection import ProjectionSpec  # noqa: E402
from delora_tpu.training.state import create_train_state  # noqa: E402
from delora_tpu.training.step import (  # noqa: E402
    FullyCachedBatch, StepConfig, make_train_step_fullcached,
)
from delora_tpu.losses.icp import IcpLossConfig  # noqa: E402

B, H, W = 8, 64, 720
CAP = H * W
LOGDIR = "/tmp/jax_trace"


def sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def main():
    from delora_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()
    rng = np.random.default_rng(0)
    spec = ProjectionSpec(H, W, 0.0345, -0.4363, -np.pi, np.pi)
    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    img = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))
    state = create_train_state(
        model, {"learning_rate": 1e-5, "fused_adam": False}, img)
    cfg = StepConfig(proj=spec, icp=IcpLossConfig(), correspondence="image")
    pts = rng.normal(size=(B, CAP, 3)).astype(np.float32) * 20
    pts[..., 2] *= 0.1
    batch = FullyCachedBatch(
        image_1=img, normal_image_1=img[..., :3],
        mean_range_1=jnp.ones((B,)),
        image_2=img,
        src_points=jnp.asarray(pts), src_normals=jnp.asarray(pts),
        src_valid=jnp.asarray(np.ones((B, CAP), bool)),
        mean_range_2=jnp.ones((B,)),
    )
    step = make_train_step_fullcached(model, cfg, donate=False)
    key = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, key)
    sync(metrics)
    t0 = time.time()
    for _ in range(20):
        state, metrics = step(state, batch, key)
    sync(metrics)
    print(f"step: {(time.time()-t0)/20*1000:.2f} ms", flush=True)

    os.system(f"rm -rf {LOGDIR}")
    with jax.profiler.trace(LOGDIR):
        for _ in range(10):
            state, metrics = step(state, batch, key)
        sync(metrics)

    files = glob.glob(f"{LOGDIR}/**/*.trace.json.gz", recursive=True)
    print("trace files:", files, flush=True)
    if not files:
        return
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device track pids (TPU / device XLA ops)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {p for p, n in pid_names.items()
                   if "TPU" in n or "/device" in n.lower() or "XLA Op" in n}
    print("processes:", pid_names, flush=True)
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") == "X" and (not device_pids or e.get("pid") in device_pids):
            name = e.get("name", "")
            tot[name] += e.get("dur", 0)
            cnt[name] += 1
    grand = sum(tot.values())
    print(f"total device op time: {grand/1e3/10:.2f} ms/step over 10 steps")
    for name, d in sorted(tot.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{d/1e3/10:9.3f} ms  x{cnt[name]:4d}  {name[:110]}")


if __name__ == "__main__":
    main()
