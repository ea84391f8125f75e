from .multihost import (
    global_batch_dict,
    initialize_distributed,
    make_global_batch,
)
from .sharding import (
    batch_sharding,
    image_sharding,
    make_mesh_2d,
    make_mesh_3d,
    make_mesh_spatial,
    make_sharded_train_step,
    make_spatial_eval_step,
    variable_shardings,
)
