"""Model cost breakdown: activation / dtype / stage ablations (real TPU)."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from delora_tpu.models.odometry import ModelConfig, OdometryModel  # noqa: E402

B, H, W = 8, 64, 720
K = 30


def sync(x):
    np.asarray(jax.tree.leaves(x)[0])


def fwdbwd_ms(model, img):
    params = model.init(jax.random.PRNGKey(0), img, img)

    def loss(p):
        t, q = model.apply(p, img, img)
        return jnp.sum(t.astype(jnp.float32) ** 2) + jnp.sum(
            q.astype(jnp.float32) ** 2)

    f = jax.jit(jax.value_and_grad(loss))
    out = f(params)
    sync(out[0])
    t0 = time.time()
    for _ in range(K):
        out = f(params)
    sync(out[0])
    return (time.time() - t0) / K * 1000


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(size=(B, H, W, 4)).astype(np.float32))
    variants = [
        ("full bf16 tanh", ModelConfig(compute_dtype=jnp.bfloat16)),
        ("full bf16 relu", ModelConfig(compute_dtype=jnp.bfloat16,
                                       activation="relu")),
        ("full f32 tanh", ModelConfig(compute_dtype=jnp.float32)),
        ("stage1-only bf16", ModelConfig(compute_dtype=jnp.bfloat16,
                                         blocks_per_stage=(2, 0, 0, 0))),
        ("stages1-2 bf16", ModelConfig(compute_dtype=jnp.bfloat16,
                                       blocks_per_stage=(2, 2, 0, 0))),
        ("no-stage1 bf16", ModelConfig(compute_dtype=jnp.bfloat16,
                                       blocks_per_stage=(0, 2, 2, 2))),
    ]
    for name, cfg in variants:
        try:
            ms = fwdbwd_ms(OdometryModel(cfg), img)
            print(f"{name:24s} {ms:8.2f} ms", flush=True)
        except Exception as e:
            print(f"{name:24s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
