from .truncated_resnet50 import (
    truncated_moco_init,
    truncated_moco_apply,
    classifier_init,
    classifier_apply,
    combined_apply,
)
from .gram_attention import gram_attention_init, gram_attention_apply
from .multi_patchgan import (
    multiscale_init,
    multiscale_apply,
    multiscale_test_init,
    multiscale_test_apply,
)
