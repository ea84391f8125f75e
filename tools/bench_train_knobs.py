"""On-chip overhead of the additive training knobs (EMA, Mixup/CutMix).

Same scan-slope method as bench.py's bench_train (RTT cancels; the exact
train_loop.make_train_step_body the CLIs dispatch) on the flagship
truncate-8 step at b128 bf16, in four variants:

  plain | --ema_decay 0.999 | --mixup 0.2 | --mixup 0.2 --cutmix 1.0

Expectation to check: EMA adds one read+write of the f32 param tree per
step (~300 MB of HBM traffic at 25 M params — ~0.4 ms against a ~50 ms
step); mixing adds a roll + blend of the augmented batch (~230 MB).

Usage: python tools/bench_train_knobs.py   (real TPU; ~4 min warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(one_step, variables, optimizer, batch, stack3, labels, combos):
    import jax
    import jax.numpy as jnp

    def make_scan(n):
        @jax.jit
        def f(v, o, stack, key):
            def step(carry, i):
                v, o, k = carry
                k, sub = jax.random.split(k)
                b = jax.lax.dynamic_index_in_dim(stack, i % 3, axis=0, keepdims=False)
                v, o, loss = one_step(v, o, b, labels, combos, sub)
                return (v, o, k), loss

            (_, _, _), losses = jax.lax.scan(
                step, (v, o, key), jnp.arange(n, dtype=jnp.int32)
            )
            return losses

        return f

    o0 = optimizer.init(variables)
    times = {}
    for n in (2, 10):
        fn = make_scan(n)
        np.asarray(fn(variables, o0, stack3, jax.random.PRNGKey(1)))  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(variables, o0, stack3, jax.random.PRNGKey(1)))
            ts.append(time.perf_counter() - t0)
        times[n] = float(np.median(ts))
    return (times[10] - times[2]) / 8


def main():
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.core.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        classifier_init,
        combined_apply,
        truncated_moco_init,
    )
    from heuristique_style_transfer_code_tpu.train.mixing import make_mix_fn
    from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
    from heuristique_style_transfer_code_tpu.train.train_loop import (
        make_train_step_body,
    )

    print(f"devices: {jax.devices()}")
    batch, truncate = 128, 8
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    variables = {
        "moco": truncated_moco_init(k1, truncate, dim=256),
        "classifier": classifier_init(k2, 256, 4),
    }
    augment = make_augment_fn(
        [(None, None), ("horizontal_flip", "brightness")], crop=224
    )

    def forward_train(v, images):
        logits, new_moco = combined_apply(
            v["moco"], v["classifier"], images.astype(jnp.bfloat16),
            truncate, train=True,
        )
        return logits, {"moco": new_moco, "classifier": v["classifier"]}

    rng = np.random.RandomState(7)
    stack3 = jnp.asarray(
        rng.randint(0, 256, (3, batch, 256, 256, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(rng.randint(0, 4, (batch,)).astype(np.int32))
    combos = jnp.asarray((np.arange(batch) % 2).astype(np.int32))

    variants = [
        ("plain", dict(ema=None, mix=None)),
        ("ema 0.999", dict(ema=0.999, mix=None)),
        ("mixup 0.2", dict(ema=None, mix=make_mix_fn(mixup_alpha=0.2))),
        ("mixup+cutmix", dict(
            ema=None, mix=make_mix_fn(mixup_alpha=0.2, cutmix_alpha=1.0)
        )),
    ]
    base = None
    for name, kw in variants:
        opt = sgd_momentum(0.01, variables, ema_decay=kw["ema"])
        one_step = make_train_step_body(
            forward_train, opt, augment, mix_fn=kw["mix"]
        )
        t = measure(one_step, variables, opt, batch, stack3, labels, combos)
        if base is None:
            base = t
        print(
            f"{name:14s}: {t * 1e3:7.2f} ms/step -> {batch / t:6.0f} img/s "
            f"({t / base:.3f}x plain)"
        )


if __name__ == "__main__":
    main()
