"""Timing: uncached / cached-target / fullcached steps after the exact
fat-sort source+target projections (project_values_exact)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from delora_tpu.models.odometry import ModelConfig, OdometryModel  # noqa: E402
from delora_tpu.ops.projection import ProjectionSpec  # noqa: E402
from delora_tpu.training.state import create_train_state  # noqa: E402
from delora_tpu.training.step import (  # noqa: E402
    CachedTargetBatch, FullyCachedBatch, ScanPairBatch, StepConfig,
    make_train_step, make_train_step_cached, make_train_step_fullcached,
)
from delora_tpu.losses.icp import IcpLossConfig  # noqa: E402

B, H, W, N = 8, 64, 720, 131072
CAP = min(N, H * W)
K = 20


def sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def run(label, step, st, batch):
    st, m = step(st, batch, jax.random.PRNGKey(0))
    sync(m["loss"])
    t0 = time.time()
    for k in range(K):
        st, m = step(st, batch, jax.random.PRNGKey(k))
    sync(m["loss"])
    el = (time.time() - t0) / K * 1000
    print(f"{label:28s} {el:8.2f} ms/step  {B / el * 1000:7.1f} pairs/s",
          flush=True)


def main():
    rng = np.random.default_rng(0)
    spec = ProjectionSpec(H, W, 0.0345, -0.4363, -np.pi, np.pi)
    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    img = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))

    def cloud(n):
        p = rng.normal(size=(B, n, 3)).astype(np.float32) * 20
        p[..., 2] *= 0.1
        return jnp.asarray(p)

    pts1, pts2 = cloud(N), cloud(N)
    nrm1, nrm2 = cloud(N), cloud(N)
    validN = jnp.asarray(np.ones((B, N), bool))
    ptsc = cloud(CAP)
    validc = jnp.asarray(np.ones((B, CAP), bool))
    timg = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))
    nimg = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))

    st = create_train_state(model, {"learning_rate": 1e-5}, img)

    cfg = StepConfig(proj=spec, icp=IcpLossConfig(), correspondence="image")
    run("fullcached", make_train_step_fullcached(model, cfg, donate=True), st,
        FullyCachedBatch(image_1=timg, normal_image_1=nimg,
                         mean_range_1=jnp.ones((B,)), image_2=img,
                         src_points=ptsc, src_normals=ptsc, src_valid=validc,
                         mean_range_2=jnp.ones((B,))))

    st = create_train_state(model, {"learning_rate": 1e-5}, img)
    cfg_a = cfg._replace(augment=True)
    run("cached-target (augment)",
        make_train_step_cached(model, cfg_a, donate=True), st,
        CachedTargetBatch(image_1=timg, normal_image_1=nimg,
                          mean_range_1=jnp.ones((B,)),
                          points_2=pts2, normals_2=nrm2, valid_2=validN))

    st = create_train_state(model, {"learning_rate": 1e-5}, img)
    run("uncached", make_train_step(model, cfg, donate=True), st,
        ScanPairBatch(points_1=pts1, normals_1=nrm1, valid_1=validN,
                      points_2=pts2, normals_2=nrm2, valid_2=validN))


if __name__ == "__main__":
    main()
