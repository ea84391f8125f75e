"""Fast-style QUALITY vs the iterative loop, measured on-chip.

The ~75-180x serving multiplier (PERF.md) compares throughput only; this
tool prices the one-pass net on the OTHER axis — the content+style loss it
actually achieves on held-out images, scored by the iterative loop's exact
objective (style_transfer.make_per_image_content_style_loss — one shared
definition) against the loop at 100/300/500 iterations. Reported as
"worth_iterations": the deepest measured loop the net still matches.

Setup mirrors tools/bench_fast_style.py: truncate-5 family-2 encoder
(fixed-seed init — the encoder only *defines* the objective; both sides
share it), width-32/5-res net, 224 crop, sinusoid-texture style target,
smooth synthetic content scenes (held-out = unseen seeds).

Usage: python tools/bench_fast_style_quality.py [--steps 1500] [--cpu]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def smooth_scenes(rng, n, size=256, base=8):
    """Low-frequency random scenes: small uniform noise upsampled — content
    with actual structure (pure high-entropy noise has no content to keep)."""
    small = rng.rand(n, base, base, 3).astype(np.float32)
    import jax
    import jax.numpy as jnp

    up = jax.image.resize(jnp.asarray(small), (n, size, size, 3), "linear")
    return np.asarray(jnp.round(jnp.clip(up, 0, 1) * 255).astype(jnp.uint8))


def stripe_style(size=224, period=8):
    """Sinusoid-texture style image (the texture-learning signal class)."""
    y = np.arange(size, dtype=np.float32)[:, None]
    x = np.arange(size, dtype=np.float32)[None, :]
    wave = 0.5 + 0.5 * np.sin(2 * np.pi * (0.6 * y + 0.4 * x) / period)
    img = np.stack([wave, 1.0 - wave, wave], axis=-1)
    return np.round(img * 255).astype(np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--held", type=int, default=16)
    ap.add_argument("--grid", type=str, default="100,300,500")
    ap.add_argument("--loop_lrs", type=str, default="0.01,0.05",
                    help="comma list of Adam lrs for the iterative loop "
                    "being priced against; the denominator at each k is "
                    "the STRONGEST loop in the sweep (serve default 0.01 "
                    "+ the r4 sensitivity winner 0.05)")
    ap.add_argument("--styles", type=int, default=1,
                    help=">1 trains ONE conditional net on that many "
                    "synthetic styles (conditional instance norm) and "
                    "prices it per style — the gallery-serving quality "
                    "axis")
    ap.add_argument("--width", type=int, default=32,
                    help="Net base width (capacity axis of the quality "
                    "frontier; serve-default 32)")
    ap.add_argument("--cpu", action="store_true",
                    help="Tiny smoke run on the CPU backend")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.core.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from heuristique_style_transfer_code_tpu.data.loader import STAGING_SIZE
    from heuristique_style_transfer_code_tpu.models.gram_attention import (
        gram_attention_init,
    )
    from heuristique_style_transfer_code_tpu.nn.transformer_net import (
        transformer_net_init,
    )
    from heuristique_style_transfer_code_tpu.tasks.fast_style import (
        compare_net_to_loop,
        encode_style_grams,
        make_fast_style_train_step,
    )
    from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
        make_extract_fn_gram_attention,
    )

    print(f"devices: {jax.devices()}", file=sys.stderr)
    crop = 64 if args.cpu else 224
    size = 96 if args.cpu else STAGING_SIZE
    width, n_res = (8, 1) if args.cpu else (args.width, 5)
    steps = min(args.steps, 60) if args.cpu else args.steps
    grid = tuple(dict.fromkeys(
        min(int(k), 25) if args.cpu else int(k)
        for k in args.grid.split(",")
    ))
    loop_lrs = tuple(
        dict.fromkeys(float(lr) for lr in args.loop_lrs.split(","))
    )

    # ONE f32 extract_fn for training, the loop and the scoring: the
    # comparison is only meaningful when every side shares the objective
    variables = gram_attention_init(jax.random.PRNGKey(1), 5, 4, 7)
    extract_fn = make_extract_fn_gram_attention(
        variables, 5, style_layers="all"
    )

    rng = np.random.RandomState(0)
    train_u8 = smooth_scenes(rng, 64 if not args.cpu else 8, size=size)
    held_u8 = smooth_scenes(np.random.RandomState(999), args.held, size=size)
    b = args.batch if not args.cpu else 4
    n_styles = max(1, int(args.styles))
    multi = n_styles > 1
    if multi:
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            encode_style_gram_stacks,
            make_multi_style_train_step,
        )

        # distinct synthetic styles: different stripe periods/orientations
        style_imgs = [
            stripe_style(crop, period=6 + 4 * s) for s in range(n_styles)
        ]
        gram_stacks = encode_style_gram_stacks(extract_fn, style_imgs, crop)
        net = transformer_net_init(
            jax.random.PRNGKey(0), width=width, n_res=n_res,
            n_styles=n_styles,
        )
        init_opt, step = make_multi_style_train_step(
            extract_fn, style_weight=1.0, content_weight=1.0,
            learning_rate=1e-3, crop=crop,
        )
        opt = init_opt(net)
        # t0 AFTER the gram encoding/jit setup: train_seconds measures the
        # 1,500 steps only (axon compile latency is wildly run-variable and
        # would otherwise dominate the number — CLAUDE.md)
        t0 = time.perf_counter()
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            balanced_style_indices,
        )

        for i in range(steps):
            batch = train_u8[rng.randint(0, len(train_u8), size=b)]
            onehot = np.zeros((b, n_styles), np.float32)
            onehot[np.arange(b), balanced_style_indices(b, n_styles, rng)] = 1.0
            net, opt, loss = step(
                net, opt, jnp.asarray(batch), jnp.asarray(onehot),
                gram_stacks,
            )
            if i % 200 == 0 or i == steps - 1:
                print(f"step {i} loss {float(loss):.5f} "
                      f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
        train_s = time.perf_counter() - t0
        t1 = time.perf_counter()
        per_style = {}
        opt_cache = {}  # ONE compile per (lr, k) across all styles
        for s in range(n_styles):
            onehot = np.zeros((n_styles,), np.float32)
            onehot[s] = 1.0
            style_grams_s = [g[s:s + 1] for g in gram_stacks]
            r = compare_net_to_loop(
                extract_fn, net, held_u8, style_grams_s, crop=crop,
                iteration_grid=grid, style_weight=1.0, content_weight=1.0,
                learning_rates=loop_lrs, style_weights=jnp.asarray(onehot),
                optimizer_cache=opt_cache,
            )
            per_style[f"style_{s}"] = {
                "worth_iterations": r["worth_iterations"],
                "net_loss_mean": round(r["net_loss_mean"], 6),
                "loop_loss_mean": {
                    str(k): round(v, 6)
                    for k, v in r["loop_loss_mean"].items()
                },
                "loop_best_lr": {
                    str(k): v for k, v in r["loop_best_lr"].items()
                },
            }
        out = {
            "metric": "fast_style_worth_iterations_conditional",
            "value": min(
                v["worth_iterations"] for v in per_style.values()
            ),
            "per_style": per_style,
            "n_styles": n_styles,
            "grid": list(grid),
            "train_steps": steps,
            "train_seconds": round(train_s, 1),
            "eval_seconds": round(time.perf_counter() - t1, 1),
            "held_out_images": int(args.held),
            "crop": crop,
            "width": width,
            "loop_lrs": list(loop_lrs),
        }
        print(json.dumps(out))
        return

    style_grams = encode_style_grams(extract_fn, stripe_style(crop), crop)
    net = transformer_net_init(jax.random.PRNGKey(0), width=width, n_res=n_res)
    init_opt, step = make_fast_style_train_step(
        extract_fn, style_weight=1.0, content_weight=1.0,
        learning_rate=1e-3, crop=crop,
    )
    opt = init_opt(net)
    t0 = time.perf_counter()  # steps only (see multi-branch note)
    for i in range(steps):
        batch = train_u8[rng.randint(0, len(train_u8), size=b)]
        net, opt, loss = step(net, opt, jnp.asarray(batch), style_grams)
        if i % 200 == 0 or i == steps - 1:
            print(
                f"step {i} loss {float(loss):.5f} "
                f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr,
            )
    train_s = time.perf_counter() - t0

    t1 = time.perf_counter()
    r = compare_net_to_loop(
        extract_fn, net, held_u8, style_grams, crop=crop,
        iteration_grid=grid, style_weight=1.0, content_weight=1.0,
        learning_rates=loop_lrs,
    )
    out = {
        "metric": "fast_style_worth_iterations",
        "value": r["worth_iterations"],
        "net_loss_mean": round(r["net_loss_mean"], 6),
        "loop_loss_mean": {
            str(k): round(v, 6) for k, v in r["loop_loss_mean"].items()
        },
        "loop_loss_mean_by_lr": {
            str(lr): {str(k): round(v, 6) for k, v in d.items()}
            for lr, d in r["loop_loss_mean_by_lr"].items()
        },
        "loop_best_lr": {str(k): v for k, v in r["loop_best_lr"].items()},
        "grid": list(grid),
        "train_steps": steps,
        "train_seconds": round(train_s, 1),
        "eval_seconds": round(time.perf_counter() - t1, 1),
        "held_out_images": int(args.held),
        "crop": crop,
        "width": width,
        "loop_lrs": list(loop_lrs),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
