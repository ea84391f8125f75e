#!/usr/bin/env python
"""API-compatible entry point: same name and flag surface as the reference's
train_best_Multi_PatchGAN.py, backed by the TPU-native engine
(heuristique_style_transfer_code_tpu.cli.train_multi_patchgan)."""
from heuristique_style_transfer_code_tpu.cli.train_multi_patchgan import main

if __name__ == "__main__":
    main()
