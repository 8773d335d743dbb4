"""Dump optimized HLO of the fullcached step and locate hot ops from the
trace (while.27, fusion.616, sort.32...) by name."""
import re
import sys

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
    batch = FullyCachedBatch(
        image_1=img, normal_image_1=img[..., :3],
        mean_range_1=jnp.ones((B,)),
        image_2=img,
        src_points=jnp.asarray(pts), src_normals=jnp.asarray(pts),
        src_valid=jnp.asarray(np.ones((B, CAP), bool)),
        mean_range_2=jnp.ones((B,)),
    )
    step = make_train_step_fullcached(model, cfg, donate=False)
    lowered = step.lower(state, batch, jax.random.PRNGKey(0))
    compiled = lowered.compile()
    txt = compiled.as_text()
    with open("/tmp/step_hlo.txt", "w") as f:
        f.write(txt)
    print("bytes:", len(txt))
    for pat in [r"while\.27\b", r"fusion\.616\b", r"sort\.32\b",
                r"while\.29\b", r"while\.30\b", r"while\.31\b",
                r"select_and_scatter\.9\b", r"fusion\.291\b"]:
        for m in re.finditer(pat, txt):
            line_start = txt.rfind("\n", 0, m.start()) + 1
            line = txt[line_start:txt.find("\n", m.start())]
            # only definition lines (start with %name = or name =)
            s = line.strip()
            if s.startswith("%" + pat.replace("\\b", "").replace("\\", "")) or \
               s.startswith(pat.replace("\\b", "").replace("\\", "")):
                print("\n>>>", s[:400])
                # print metadata source line if present
                mm = re.search(r'metadata=\{[^}]*\}', s)
                if mm:
                    print("    ", mm.group(0)[:300])
                break


if __name__ == "__main__":
    main()
