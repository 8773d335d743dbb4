import time, numpy as np, jax, jax.numpy as jnp
from delora_tpu.ops.pallas.window_match import window_match_pallas

for (H, W, wv, wu, B) in [(64, 2250, 5, 9, 1), (64, 2250, 5, 9, 2), (64, 2250, 5, 9, 4)]:
    Hp = H + wv - 1
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(B,3,H,W)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(B,7,Hp,W)).astype(np.float32))
    try:
        t0=time.time()
        out = window_match_pallas(src, tgt, wv=wv, wu=wu, max_batch=B)
        jax.block_until_ready(out)
        print(f"H={H} W={W} B={B}: OK ({time.time()-t0:.1f}s)")
    except Exception as e:
        msg = str(e).split("\n")[0][:200]
        print(f"H={H} W={W} B={B}: FAIL {type(e).__name__}: {msg}")
