from delora_tpu.training.step import (  # noqa: F401
    StepConfig,
    ScanPairBatch,
    make_train_step,
    make_infer_step,
    loss_and_metrics,
)
from delora_tpu.training.state import TrainState, create_train_state  # noqa: F401
