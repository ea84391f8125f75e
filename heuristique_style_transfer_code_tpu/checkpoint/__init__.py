from .async_io import AsyncCheckpointWriter
from .io import (
    load_hyperparameters,
    load_pytree_npz,
    load_pytree_orbax,
    save_model_and_hyperparameters,
    save_pytree_npz,
    save_pytree_orbax,
)
from .sharded_io import load_sharded_pytree, save_sharded_pytree
from .pth_converter import (
    load_torch_state_dict,
    convert_resnet_children,
    convert_moco_checkpoint,
    convert_gram_attention_checkpoint,
    convert_multi_patchgan_checkpoint,
    convert_multi_patchgan_test_checkpoint,
    shape_filtered_update,
)
from .pth_exporter import (
    export_checkpoint_tree,
    export_gram_attention_checkpoint,
    export_moco_checkpoint,
    export_multi_patchgan_checkpoint,
    export_multi_patchgan_test_checkpoint,
    save_pth,
)
