from .schema import (
    TruncatedResNetConfig,
    GramAttentionConfig,
    MultiPatchGANConfig,
    load_config,
)
