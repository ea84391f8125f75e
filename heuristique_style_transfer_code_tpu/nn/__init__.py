from .resnet import (
    resnet50_init,
    resnet50_apply,
    resnet50_stem,
    resnet50_stage_channels,
    truncated_feature_channels,
    RESNET50_CHILDREN,
)
from .resnet_int8 import (
    calibrate_activation_scales,
    load_quantized,
    prepare_int8_resnet,
    quantize_resnet50,
    resnet50_apply_int8,
    save_quantized,
)
from .patch_discriminator import (
    discriminator_layer_plan,
    patch_discriminator_init,
    patch_discriminator_apply,
    patch_discriminator_test_init,
    patch_discriminator_test_apply,
)
