from .mesh import (
    make_mesh, replicate, shard_rows, param_shardings,
    make_sharded_train_step, make_sharded_ensemble_forward,
)

__all__ = [
    "make_mesh",
    "replicate",
    "shard_rows",
    "param_shardings",
    "make_sharded_train_step",
    "make_sharded_ensemble_forward",
]
