#!/usr/bin/env python
"""API-compatible entry point: same name and flag surface as the reference's
train_best_RESNET50_Truncate_gram_attention.py, backed by the TPU-native engine
(heuristique_style_transfer_code_tpu.cli.train_gram_attention)."""
from heuristique_style_transfer_code_tpu.cli.train_gram_attention import main

if __name__ == "__main__":
    main()
