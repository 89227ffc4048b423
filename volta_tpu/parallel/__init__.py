from .mesh import (batch_sharding, make_mesh, param_shardings, replicated,
                   shard_batch)
from .train_step import (TrainState, create_train_state, make_pretrain_step,
                         make_task_eval_step, make_task_train_step)

__all__ = [
    "batch_sharding", "make_mesh", "param_shardings", "replicated",
    "shard_batch", "TrainState", "create_train_state", "make_pretrain_step",
    "make_task_eval_step", "make_task_train_step",
]
