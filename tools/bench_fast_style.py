"""On-chip fast-style numbers: feed-forward stylize fps + net train step.

Scan-slope method (PERF.md): N forwards as one on-device lax.scan at two N
values, slope = per-step time — the relay RTT cancels. Classic net config
(width 32, n_res 5, ~1.7 M params), crop 224, bf16 compute.

Usage: python tools/bench_fast_style.py   (real TPU; ~5 min warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def scan_slope(fn_one_step, carry0, n1=10, n2=50, reps=3):
    import jax

    times = {}
    for n in (n1, n2):
        def scanned(carry):
            def body(c, _):
                return fn_one_step(c), None
            c, _ = jax.lax.scan(body, carry, None, length=n)
            return c

        run = jax.jit(scanned)
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(carry0)
            np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            times.setdefault(n, []).append(time.perf_counter() - t0)
    return (np.median(times[n2][1:]) - np.median(times[n1][1:])) / (n2 - n1)


def main():
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.core.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from heuristique_style_transfer_code_tpu.models.gram_attention import (
        gram_attention_init,
    )
    from heuristique_style_transfer_code_tpu.nn.transformer_net import (
        count_params,
        transformer_net_apply,
        transformer_net_init,
    )
    from heuristique_style_transfer_code_tpu.tasks.fast_style import (
        make_fast_style_train_step,
    )
    from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
        make_extract_fn_gram_attention,
    )

    print(f"devices: {jax.devices()}")
    rng = np.random.RandomState(0)
    net = transformer_net_init(jax.random.PRNGKey(0), width=32, n_res=5)
    print(f"net params: {count_params(net):,}")

    # --- feed-forward stylize capacity (the serving path) -----------------
    for b in (16, 64):
        x = jnp.asarray(
            (rng.rand(b, 224, 224, 3).astype(np.float32) - 0.45) / 0.22
        )

        def step(carry, p=net):
            y = transformer_net_apply(p, carry, compute_dtype=jnp.bfloat16)
            return y  # stylised re-enters: keeps data resident + distinct

        dt = scan_slope(step, x)
        print(
            f"stylize b{b} 224² bf16: {dt * 1e3 / b:6.3f} ms/img -> "
            f"{b / dt:8.0f} img/s"
        )

    # --- training step (encoder truncate-5, style_layers=all) -------------
    variables = gram_attention_init(jax.random.PRNGKey(1), 5, 4, 7)
    extract_fn = make_extract_fn_gram_attention(
        variables, 5, compute_dtype=jnp.bfloat16, style_layers="all"
    )
    b = 16
    images_u8 = jnp.asarray(rng.randint(0, 256, (b, 256, 256, 3), dtype=np.uint8))
    from heuristique_style_transfer_code_tpu.data.augment import (
        eval_preprocess,
    )

    feats, grams = jax.jit(
        lambda u8: extract_fn(eval_preprocess(u8, 224))
    )(images_u8)
    style_grams = [jnp.asarray(np.asarray(g[:1], np.float32)) for g in grams]

    init_opt, train_step = make_fast_style_train_step(
        extract_fn, learning_rate=1e-3, crop=224, compute_dtype=jnp.bfloat16
    )

    # train_step donates params/opt_state: every rep needs FRESH device
    # buffers (reusing `net` after the first rep is a deleted-buffer error
    # on the TPU). Keep a host copy and re-put per rep.
    net_host = jax.device_get(net)

    # time dispatch-at-a-time over K calls minus RTT is noisy — use two
    # call-counts instead
    times = {}
    for n in (5, 25):
        for _ in range(3):
            p = jax.device_put(net_host)
            o = init_opt(p)
            t0 = time.perf_counter()
            for _ in range(n):
                p, o, loss = train_step(p, o, images_u8, style_grams)
            float(loss)
            times.setdefault(n, []).append(time.perf_counter() - t0)
    dt = (np.median(times[25][1:]) - np.median(times[5][1:])) / 20
    print(
        f"train step b{b} 224² bf16 (truncate5, all-grams): "
        f"{dt * 1e3:6.1f} ms/step -> {b / dt:6.0f} img/s"
    )


if __name__ == "__main__":
    main()
