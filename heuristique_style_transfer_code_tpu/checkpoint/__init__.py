from .io import save_pytree_npz, load_pytree_npz, save_model_and_hyperparameters, load_hyperparameters
from .pth_converter import (
    load_torch_state_dict,
    convert_resnet_children,
    convert_moco_checkpoint,
    convert_gram_attention_checkpoint,
    convert_multi_patchgan_checkpoint,
    convert_multi_patchgan_test_checkpoint,
    shape_filtered_update,
)
