"""Offline checkpoint converter: reference .pth -> native .npz (or orbax).

    python -m heuristique_style_transfer_code_tpu.cli.convert_checkpoint \
        --family truncated_resnet50 --input best_global_model.pth \
        --output best_global_model.npz [--config cfg.json]

Families: truncated_resnet50 | gram_attention | multi_patchgan |
multi_patchgan_test (the PatchGAN families need --config for patch_sizes).
"""
from __future__ import annotations

import argparse
import json


def build_parser():
    parser = argparse.ArgumentParser(description="Convert reference .pth checkpoints")
    parser.add_argument(
        "--family", required=True,
        choices=["truncated_resnet50", "gram_attention", "multi_patchgan",
                 "multi_patchgan_test"],
    )
    parser.add_argument("--input", required=True, help=".pth checkpoint")
    parser.add_argument("--output", required=True, help=".npz output (or a dir for --format orbax)")
    parser.add_argument("--config", help="hyperparameter JSON (patch_sizes/ndf/norm)")
    parser.add_argument("--format", choices=["npz", "orbax"], default="npz")
    return parser


def main(argv=None):
    args = build_parser().parse_args(argv)
    config = {}
    if args.config:
        with open(args.config) as f:
            config = json.load(f)

    from ._common import load_checkpoint_tree

    tree = load_checkpoint_tree(args.input, args.family, config)

    if args.format == "npz":
        from ..checkpoint.io import save_pytree_npz

        save_pytree_npz(tree, args.output)
    else:
        from ..checkpoint.io import save_pytree_orbax

        save_pytree_orbax(tree, args.output)
    from ._common import count_params

    print(f"Converted {args.input} -> {args.output} ({count_params(tree)} parameters)")


if __name__ == "__main__":
    main()
