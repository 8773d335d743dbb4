from delora_tpu.parallel.mesh import make_mesh, initialize_multihost  # noqa: F401
from delora_tpu.parallel.pjit_step import (  # noqa: F401
    make_sharded_train_step,
    shard_batch,
    replicate_state,
)
