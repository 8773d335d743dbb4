"""Component-level step timing probe (run on the real TPU chip).

Times each piece of the fullcached train step in isolation so optimization
effort goes where the milliseconds are. Through the axon relay
``block_until_ready`` does not block, so every timing is bracketed by actual
host readbacks (same methodology as bench.py): sync, dispatch K iterations,
sync again.

Usage: PYTHONPATH=/root/.axon_site python scripts/perf_probe.py [B]
"""
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
from delora_tpu.ops.correspondence import (  # noqa: E402
    image_space_correspondence_batch,
)
from delora_tpu.training.state import create_train_state  # noqa: E402
from delora_tpu.training.step import (  # noqa: E402
    FullyCachedBatch, StepConfig, make_train_step_fullcached,
)
from delora_tpu.losses.icp import IcpLossConfig  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
H, W, N = 64, 720, 131072
CAP = min(N, H * W)
K = 30


def sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def timeit(name, fn, *args):
    out = fn(*args)          # compile
    sync(out)
    t0 = time.time()
    for _ in range(K):
        out = fn(*args)
    sync(out)
    ms = (time.time() - t0) / K * 1000
    print(f"{name:36s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    spec = ProjectionSpec(H, W, 0.0345, -0.4363, -np.pi, np.pi)

    model = OdometryModel(ModelConfig(compute_dtype=jnp.bfloat16))
    img = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))
    state = create_train_state(
        model, {"learning_rate": 1e-5, "fused_adam": False}, img)
    state_f = create_train_state(
        model, {"learning_rate": 1e-5, "fused_adam": True}, img)

    # ---- model fwd / fwd+bwd alone
    def fwdbwd(params, i1, i2):
        def loss(p):
            t, q = model.apply(p, i1, i2)
            return jnp.sum(t.astype(jnp.float32) ** 2) + jnp.sum(
                q.astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(params)

    jfb = jax.jit(fwdbwd)
    _, grads = jfb(state.params, img, img)
    timeit("model fwd+bwd", jfb, state.params, img, img)
    timeit("model fwd only",
           jax.jit(lambda p, a, b: model.apply(p, a, b)),
           state.params, img, img)

    # ---- Adam update alone (no donation so args stay valid)
    jadam = jax.jit(lambda s, g: s.apply_gradients(grads=g))
    timeit("adam update per-leaf", jadam, state, grads)
    timeit("adam update fused", jadam, state_f, grads)

    # ---- packed projection (warped reprojection path: cap-sized input,
    #      6 payload channels like the train step)
    pts = rng.normal(size=(B, CAP, 3)).astype(np.float32) * 20
    pts[..., 2] *= 0.1
    valid = np.ones((B, CAP), bool)
    ptsj = jnp.asarray(pts)
    validj = jnp.asarray(valid)
    vals = jnp.concatenate([ptsj, ptsj], axis=-1)
    proj = jax.jit(jax.vmap(
        lambda p, v, m: project_image_packed(p, m, spec, values=v)))
    timeit(f"project_image_packed (Bx{CAP},6ch)", proj, ptsj, vals, validj)

    # image-only, no payload (serving shape: B=1, N=131k)
    pts1 = jnp.asarray(
        rng.normal(size=(1, N, 3)).astype(np.float32) * 20)
    val1 = jnp.asarray(np.ones((1, N), bool))
    proj1 = jax.jit(jax.vmap(lambda p, m: project_image_packed(p, m, spec)))
    timeit("project_image_packed (1x131k)", proj1, pts1, val1)

    from delora_tpu.ops.projection import project_scan
    projs = jax.jit(jax.vmap(lambda p, m: project_scan(p, m, spec).image))
    timeit("project_scan.image (1x131k)", projs, pts1, val1)

    # ---- window matcher (inputs as explicit args, not closures)
    timg = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))
    nimg = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    sx = jnp.asarray(rng.normal(size=(B, H * W, 3)).astype(np.float32))
    so = jnp.asarray(rng.random((B, H * W)) > 0.3)

    def match(s, o, t, n):
        c = image_space_correspondence_batch(
            s, o, t, n, spec, (5, 9), backend="pallas")
        return c.target_points
    timeit("window matcher (pallas)", jax.jit(match), sx, so, timg, nimg)

    # ---- full fullcached step, per-leaf vs fused adam
    cfg = StepConfig(proj=spec, icp=IcpLossConfig(), correspondence="image")
    batch = FullyCachedBatch(
        image_1=timg, normal_image_1=nimg,
        mean_range_1=jnp.ones((B,)),
        image_2=img,
        src_points=ptsj, src_normals=ptsj, src_valid=validj,
        mean_range_2=jnp.ones((B,)),
    )

    for label, st0 in (("per-leaf", state), ("fused", state_f)):
        step = make_train_step_fullcached(model, cfg, donate=True)
        st, m = step(st0, batch, jax.random.PRNGKey(0))
        sync(m["loss"])
        t0 = time.time()
        for k in range(K):
            st, m = step(st, batch, jax.random.PRNGKey(k))
        sync(m["loss"])
        print(f"{'full fullcached step ' + label:36s} "
              f"{(time.time()-t0)/K*1000:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
