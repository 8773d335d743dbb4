"""Focused A/B: new bf16-split packed projection + full step fused/per-leaf Adam."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from delora_tpu.models.odometry import ModelConfig, OdometryModel  # noqa: E402
from delora_tpu.ops.projection import (  # noqa: E402
    ProjectionSpec, project_image_packed,
)
from delora_tpu.training.state import create_train_state  # noqa: E402
from delora_tpu.training.step import (  # noqa: E402
    FullyCachedBatch, StepConfig, make_train_step_fullcached,
)
from delora_tpu.losses.icp import IcpLossConfig  # noqa: E402

B, H, W, N = 8, 64, 720, 131072
CAP = min(N, H * W)
K = 30


def sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def timeit(name, fn, *args):
    out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(K):
        out = fn(*args)
    sync(out)
    print(f"{name:36s} {(time.time()-t0)/K*1000:8.2f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    spec = ProjectionSpec(H, W, 0.0345, -0.4363, -np.pi, np.pi)
    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    img = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))

    pts = rng.normal(size=(B, CAP, 3)).astype(np.float32) * 20
    pts[..., 2] *= 0.1
    ptsj = jnp.asarray(pts)
    validj = jnp.asarray(np.ones((B, CAP), bool))
    vals = jnp.concatenate([ptsj, ptsj], axis=-1)
    proj = jax.jit(jax.vmap(
        lambda p, v, m: project_image_packed(p, m, spec, values=v)))
    timeit(f"packed bf16split (Bx{CAP},6ch)", proj, ptsj, vals, validj)

    timg = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))
    nimg = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    cfg = StepConfig(proj=spec, icp=IcpLossConfig(), correspondence="image")
    batch = FullyCachedBatch(
        image_1=timg, normal_image_1=nimg, mean_range_1=jnp.ones((B,)),
        image_2=img, src_points=ptsj, src_normals=ptsj, src_valid=validj,
        mean_range_2=jnp.ones((B,)),
    )
    for label, fused in (("fused", True), ("per-leaf", False)):
        st0 = create_train_state(
            model, {"learning_rate": 1e-5, "fused_adam": fused}, img)
        step = make_train_step_fullcached(model, cfg, donate=True)
        st, m = step(st0, batch, jax.random.PRNGKey(0))
        sync(m["loss"])
        t0 = time.time()
        for k in range(K):
            st, m = step(st, batch, jax.random.PRNGKey(k))
        sync(m["loss"])
        print(f"{'full step ' + label:36s} {(time.time()-t0)/K*1000:8.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
