from ssd_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS, MODEL_AXIS, batch_sharding, create_mesh, fsdp_sharded,
    model_sharded, replicated, shard_batch,
)
from ssd_tpu.parallel.train_step import (  # noqa: F401
    TrainState, create_train_state, jit_train_step, make_eval_step,
    make_lr_schedule, make_optimizer, make_train_step,
)
