from .linear import linear, linear_init
from .conv import conv2d, conv2d_init, max_pool2d, avg_pool2d
from .norm import (
    batch_norm,
    batch_norm_init,
    instance_norm,
    layer_norm_tail,
)
from .pooling import adaptive_avg_pool2d, adaptive_pool_matrix, global_avg_pool
from .attention import multihead_attention, multihead_attention_init
from .gram import gram_matrix_nhwc, gram_matrix_ncl, pooled_gram_nhwc
from .resize import (
    resize_matrix,
    resize_image,
    resize_shorter_side,
    center_crop,
    normalize_imagenet,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
