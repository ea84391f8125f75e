from .sharding import (
    make_mesh_2d,
    variable_shardings,
    batch_sharding,
    make_sharded_train_step,
)
