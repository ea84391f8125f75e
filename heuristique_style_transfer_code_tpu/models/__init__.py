from .truncated_resnet50 import (
    truncated_moco_init,
    truncated_moco_apply,
    classifier_init,
    classifier_apply,
    combined_apply,
    combined_apply_int8,
    prepare_combined_int8,
)
from .gram_attention import (
    gram_attention_init,
    gram_attention_apply,
    gram_attention_apply_int8,
    prepare_gram_attention_int8,
)
from .multi_patchgan import (
    multiscale_init,
    multiscale_apply,
    multiscale_test_init,
    multiscale_test_apply,
)
