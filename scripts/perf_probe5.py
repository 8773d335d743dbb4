"""A/B: Pallas chunked placement kernel vs XLA lax.map placement, isolated
and inside the full fullcached step (real TPU)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from delora_tpu.utils.cache import enable_persistent_cache  # noqa: E402
enable_persistent_cache()

from delora_tpu.models.odometry import ModelConfig, OdometryModel  # noqa: E402
from delora_tpu.ops.projection import (  # noqa: E402
    ProjectionSpec, project_image_packed_batch, project_compact_exact_batch,
)
from delora_tpu.training.state import create_train_state  # noqa: E402
from delora_tpu.training.step import (  # noqa: E402
    FullyCachedBatch, StepConfig, make_train_step_fullcached,
)
from delora_tpu.losses.icp import IcpLossConfig  # noqa: E402

B, H, W = 8, 64, 720
CAP = H * W
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
    print(f"{name:44s} {(time.time()-t0)/K*1000:8.2f} ms", flush=True)
    return out


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    spec = ProjectionSpec(H, W, 0.0345, -0.4363, -np.pi, np.pi)

    pts = rng.normal(size=(B, CAP, 3)).astype(np.float32) * 20
    pts[..., 2] *= 0.1
    valid = jnp.asarray(np.ones((B, CAP), bool))
    ptsj = jnp.asarray(pts)
    vals = jnp.concatenate([ptsj, ptsj], axis=-1)

    for be in ("xla", "pallas"):
        f = jax.jit(lambda p, v, m, be=be: project_image_packed_batch(
            p, m, spec, values=v, backend=be))
        r = timeit(f"packed placement [{be}] (B=8, 46k, 6ch)", f, ptsj, vals, valid)

    r_xla = jax.jit(lambda p, v, m: project_image_packed_batch(
        p, m, spec, values=v, backend="xla"))(ptsj, vals, valid)
    r_pl = jax.jit(lambda p, v, m: project_image_packed_batch(
        p, m, spec, values=v, backend="pallas"))(ptsj, vals, valid)
    print("packed parity max|diff|:",
          float(jnp.max(jnp.abs(r_xla - r_pl))), flush=True)

    # raw-density compact-exact (N=131k)
    N = 131072
    raw = rng.normal(size=(B, N, 3)).astype(np.float32) * 20
    raw[..., 2] *= 0.1
    rawj = jnp.asarray(raw)
    rvalid = jnp.asarray(np.ones((B, N), bool))
    rvals = jnp.concatenate([rawj, rawj], axis=-1)
    for be in ("xla", "pallas"):
        f = jax.jit(lambda p, v, m, be=be: project_compact_exact_batch(
            p, m, spec, values=v, backend=be).image)
        timeit(f"compact-exact [{be}] (B=8, 131k, 6ch)", f, rawj, rvals, rvalid)

    c_xla = jax.jit(lambda p, v, m: project_compact_exact_batch(
        p, m, spec, values=v, backend="xla").image)(rawj, rvals, rvalid)
    c_pl = jax.jit(lambda p, v, m: project_compact_exact_batch(
        p, m, spec, values=v, backend="pallas").image)(rawj, rvals, rvalid)
    print("compact parity max|diff|:",
          float(jnp.max(jnp.abs(c_xla - c_pl))), flush=True)

    # full fullcached step
    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    img = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))
    batch = FullyCachedBatch(
        image_1=img, normal_image_1=img[..., :3],
        mean_range_1=jnp.ones((B,)),
        image_2=img,
        src_points=ptsj, src_normals=ptsj, src_valid=valid,
        mean_range_2=jnp.ones((B,)),
    )
    key = jax.random.PRNGKey(0)
    for be in ("xla", "pallas"):
        cfg = StepConfig(proj=spec, icp=IcpLossConfig(),
                         correspondence="image", placement_backend=be)
        state = create_train_state(
            model, {"learning_rate": 1e-5}, img)
        step = make_train_step_fullcached(model, cfg, donate=False)
        st, m = step(state, batch, key)
        sync(m)
        t0 = time.time()
        for _ in range(K):
            st, m = step(st, batch, key)
        sync(m)
        print(f"full step [{be}]: {(time.time()-t0)/K*1000:8.2f} ms  "
              f"loss={float(m['loss']):.5f}", flush=True)


if __name__ == "__main__":
    main()
