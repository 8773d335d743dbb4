#!/usr/bin/env python3
"""Forward-latency microbenchmark (counterpart of reference
scripts/time_network.py:52-93): repeated timed forwards on a random
VLP-16-shaped input pair [1, 16, 720, 4], jitted, with readback-bracketed
timing (block_until_ready does not sync through the axon relay).

Usage: python scripts/time_network.py [iters] [height] [width]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from delora_tpu.models.odometry import ModelConfig, OdometryModel  # noqa: E402
from delora_tpu.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 720

    print(f"devices: {jax.devices()}  input [1, {H}, {W}, 4] x2")
    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    rng = jax.random.PRNGKey(0)
    img = jax.random.normal(rng, (1, H, W, 4), jnp.float32)
    params = model.init(rng, img, img)

    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))

    t0 = time.time()
    t, q = fwd(params, img, img)
    _ = float(jnp.sum(t))
    print(f"compile+first: {time.time() - t0:.2f}s")

    lat = []
    for _ in range(iters):
        t0 = time.time()
        t, q = fwd(params, img, img)
        _ = float(jnp.sum(t)) + float(jnp.sum(q))
        lat.append(time.time() - t0)
    lat_ms = np.asarray(lat) * 1000
    print(f"forward latency over {iters} iters: "
          f"p50={np.percentile(lat_ms, 50):.2f} ms  "
          f"p90={np.percentile(lat_ms, 90):.2f} ms  "
          f"mean={lat_ms.mean():.2f} ms  (10 Hz budget: 100 ms)")


if __name__ == "__main__":
    main()
