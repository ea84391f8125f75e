"""On-chip memory/throughput measurement for --remat (jax.checkpoint).

Two questions, answered on the real chip:
1. How much does per-bottleneck rematerialisation cut the train step's
   peak HBM (XLA ``memory_analysis`` of the exact compiled step, with the
   CLI's donation), and what batch ceiling does that buy?
2. What does it cost (scan-slope img/s at matched batch), and what does
   the bigger-batch step it enables deliver?

Flagship config: family-1 truncate-8 combined model, bf16 activations,
224^2 crops from 256^2 uint8 inputs — the --precision bf16 CLI path.

Usage: python tools/bench_remat.py   (real TPU; compiles ~10 programs)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCHES = (128, 256, 512, 1024)
CANVAS = 256
GIB = 1024 ** 3


def build(remat: bool):
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.config.schema import (
        TruncatedResNetConfig,
    )
    from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        classifier_init,
        combined_apply,
        truncated_moco_init,
    )
    from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
    from heuristique_style_transfer_code_tpu.train.train_loop import (
        make_train_step_body,
    )

    cfg = TruncatedResNetConfig()
    t = cfg.truncate_layer
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    variables = {
        "moco": truncated_moco_init(k1, t, dim=cfg.dim),
        "classifier": classifier_init(k2, cfg.dim, 4),
    }

    def forward_train(v, images):
        logits, new_moco = combined_apply(
            v["moco"], v["classifier"], images.astype(jnp.bfloat16), t,
            train=True, remat=remat,
        )
        return logits, {"moco": new_moco, "classifier": v["classifier"]}

    optimizer = sgd_momentum(cfg.lr, variables)
    augment = make_augment_fn(
        [(None, None), ("horizontal_flip", "brightness")], crop=224
    )
    body = make_train_step_body(forward_train, optimizer, augment)
    return variables, optimizer, body


def mem_analysis(body, variables, opt_state, batch):
    """Peak-memory picture of the exact per-step program the CLI dispatches
    (donated carry, like train_loop.make_train_step)."""
    import jax
    import jax.numpy as jnp

    step = jax.jit(body, donate_argnums=(0, 1))
    args = (
        variables,
        opt_state,
        jax.ShapeDtypeStruct((batch, CANVAS, CANVAS, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    compiled = step.lower(*args).compile()
    m = compiled.memory_analysis()
    return {
        "temp": int(m.temp_size_in_bytes),
        "args": int(m.argument_size_in_bytes),
        "out": int(m.output_size_in_bytes),
        "alias": int(m.alias_size_in_bytes),
    }


def throughput(body, variables, optimizer, batch):
    """Scan-slope img/s (RTT cancels; 3 distinct staged batches)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(7)
    stack3 = jnp.asarray(
        rng.randint(0, 256, (3, batch, CANVAS, CANVAS, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(rng.randint(0, 4, (batch,)).astype(np.int32))
    combos = jnp.asarray((np.arange(batch) % 2).astype(np.int32))

    def make_scan(n):
        @jax.jit
        def f(v, o, stack, key):
            def step(carry, i):
                v, o, k = carry
                k, sub = jax.random.split(k)
                b = jax.lax.dynamic_index_in_dim(stack, i % 3, 0, keepdims=False)
                v, o, loss = body(v, o, b, labels, combos, sub)
                return (v, o, k), loss

            _, losses = jax.lax.scan(
                step, (v, o, key), jnp.arange(n, dtype=jnp.int32)
            )
            return losses

        return f

    o0 = optimizer.init(variables)
    times = {}
    for n in (2, 10):
        fn = make_scan(n)
        np.asarray(fn(variables, o0, stack3, jax.random.PRNGKey(1)))  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(variables, o0, stack3, jax.random.PRNGKey(1)))
            ts.append(time.perf_counter() - t0)
        times[n] = float(np.median(ts))
    t_step = (times[10] - times[2]) / 8
    return t_step


def main():
    import jax

    from heuristique_style_transfer_code_tpu.core.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()
    dev = jax.devices()[0]
    print(f"devices: {jax.devices()}")
    hbm = None
    stats = getattr(dev, "memory_stats", lambda: None)()
    if stats and "bytes_limit" in stats:
        hbm = stats["bytes_limit"]
        print(f"HBM bytes_limit: {hbm / GIB:.2f} GiB")

    results = {}
    for remat in (False, True):
        variables, optimizer, body = build(remat)
        o0_shapes = jax.eval_shape(optimizer.init, variables)
        for batch in BATCHES:
            try:
                m = mem_analysis(body, variables, o0_shapes, batch)
            except Exception as e:  # OOM at compile/alloc analysis time
                print(f"remat={remat} b{batch}: memory_analysis failed: "
                      f"{type(e).__name__}: {str(e)[:200]}")
                continue
            peak = m["temp"] + m["args"]
            fits = "" if hbm is None else f"  fits={peak < hbm * 0.95}"
            print(
                f"remat={remat} b{batch}: temp {m['temp'] / GIB:.2f} GiB, "
                f"args {m['args'] / GIB:.2f} GiB, peak~{peak / GIB:.2f} GiB{fits}"
            )
            results[(remat, batch)] = peak

    # throughput at matched batch (remat cost) and at the largest batch
    # that memory_analysis says fits in each mode
    limit = (hbm or 16 * GIB) * 0.95
    for remat in (False, True):
        variables, optimizer, body = build(remat)
        fitting = [b for b in BATCHES if results.get((remat, b), 1 << 62) < limit]
        for batch in sorted({128, max(fitting or [128])}):
            try:
                t = throughput(body, variables, optimizer, batch)
                print(f"remat={remat} b{batch}: {t * 1e3:.2f} ms/step -> "
                      f"{batch / t:.0f} img/s")
            except Exception as e:
                print(f"remat={remat} b{batch}: run failed: "
                      f"{type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
