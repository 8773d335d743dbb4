"""Real-chip parity: xla vs pallas placement after the in-kernel split."""
import time, numpy as np, jax, jax.numpy as jnp
from delora_tpu.ops.projection import (
    ProjectionSpec, project_image_packed_batch, project_compact_exact_batch)

H, W, N, B = 64, 720, 46080, 8
spec = ProjectionSpec(height=H, width=W,
    fov_down=float(np.deg2rad(-24.5)), fov_up=float(np.deg2rad(2.0)),
    fov_left=float(np.deg2rad(-179.9)), fov_right=float(np.deg2rad(179.9)))
rng = np.random.default_rng(0)
pts = jnp.asarray((rng.normal(size=(B,N,3))*np.array([12,12,1.0])-[0,0,1.6]).astype(np.float32))
valid = jnp.asarray(rng.random((B,N)) > 0.1)
vals = jnp.concatenate([pts, jnp.asarray(rng.normal(size=(B,N,3)).astype(np.float32))], -1)

for name, fn in [("packed", project_image_packed_batch), ("compact", project_compact_exact_batch)]:
    a = fn(pts, valid, spec, values=vals, backend="xla")
    b = fn(pts, valid, spec, values=vals, backend="pallas")
    ia = a if name=="packed" else a.image
    ib = b if name=="packed" else b.image
    d = float(jnp.max(jnp.abs(ia - ib)))
    print(f"{name}: max|xla-pallas| = {d}")

# timing of the pallas packed path
f = jax.jit(lambda p, v, x: project_image_packed_batch(p, v, spec, values=x, backend="pallas"))
r = f(pts, valid, vals); jax.block_until_ready(r)
t0=time.time()
for _ in range(20): r = f(pts, valid, vals)
jax.block_until_ready(r)
print(f"packed pallas: {(time.time()-t0)/20*1000:.2f} ms")
