#!/usr/bin/env python
"""API-compatible entry point: same name and flag surface as the reference's
train_best_RESNET50_Truncate.py, backed by the TPU-native engine
(heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50)."""
from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

if __name__ == "__main__":
    main()
