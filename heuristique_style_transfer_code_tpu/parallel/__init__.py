from .foldparallel import (
    make_fold_mesh,
    make_foldwise_train_step,
    stack_fold_states,
    train_folds_parallel,
    unstack_fold_state,
)
from .multihost import (
    global_batch_dict,
    initialize_distributed,
    make_global_batch,
)
from .pipeline import (
    FLAGSHIP_UNITS,
    PipelineSpec,
    PipelineUnits,
    make_flagship_units,
    make_mesh_pipeline,
    make_pipeline_eval_step,
    make_pipeline_spec,
    make_pipeline_train_step,
    pack_pipeline_masks,
    pack_pipeline_params,
    pipeline_batch_sharding,
    pipeline_param_sharding,
    unpack_pipeline_params,
)
from .sharding import (
    batch_sharding,
    image_sharding,
    make_mesh_2d,
    make_mesh_3d,
    make_mesh_spatial,
    fsdp_variable_shardings,
    make_fsdp_train_step,
    make_sharded_train_step,
    make_spatial_eval_step,
    make_zero1_train_step,
    variable_shardings,
    zero1_state_shardings,
)
