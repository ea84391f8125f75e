"""On-chip training-step capacity for families 2 and 3.

PERF.md's capacity table has the family-1 train step and the family-2/3
FORWARDS, but neither family's full train step (fwd + bwd + SGD + stat
merge + on-device augmentation) had a hardware number. Same method as
bench.py's bench_train: scan-slope over K train steps at two K values
(RTT cancels), inputs cycling 3 distinct pre-staged uint8 batches,
bf16 activations (the --precision bf16 CLI path), the exact
train_loop.make_train_step_body the CLIs dispatch.

Family 2: gram+attention head on the truncate-8 encoder
  (models/gram_attention.py; reference
  Models/Models_RESNET50_Truncate_Gram_Attention.py).
Family 3: multi-scale PatchGAN test discriminator classifier
  (models/multi_patchgan.py; reference Models/Models_Multi_PatchGAN.py).

Usage: python tools/bench_train_family23.py   (real TPU; ~5 min warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure_train_step(forward_train, variables, batch, canvas=256):
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
    from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
    from heuristique_style_transfer_code_tpu.train.train_loop import (
        make_train_step_body,
    )

    optimizer = sgd_momentum(0.01, variables)
    augment = make_augment_fn(
        [(None, None), ("horizontal_flip", "brightness")], crop=224
    )
    one_step = make_train_step_body(forward_train, optimizer, augment)

    rng = np.random.RandomState(7)
    stack3 = jnp.asarray(
        rng.randint(0, 256, (3, batch, canvas, canvas, 3), dtype=np.uint8)
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
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}")

    # ---- family 2: truncate-8 encoder + S=7 pooled grams + attention head
    from heuristique_style_transfer_code_tpu.models.gram_attention import (
        gram_attention_apply,
        gram_attention_init,
    )

    t, s, ncls, b2 = 8, 7, 4, 64
    v2 = gram_attention_init(jax.random.PRNGKey(0), t, ncls, s)

    def fwd2(v, images):
        _, logits, new_v = gram_attention_apply(
            v, images.astype(jnp.bfloat16), t, s, ncls, train=True
        )
        return logits, new_v

    t2 = measure_train_step(fwd2, v2, b2)
    print(
        f"family-2 gram+attention train (bf16, b{b2}, 224^2): "
        f"{t2 * 1e3:.2f} ms/step -> {b2 / t2:.0f} img/s"
    )

    # ---- family 3: multi-scale test discriminator (default reference
    # patch sizes 10/70/150, ndf 64, batch norm)
    from heuristique_style_transfer_code_tpu.config.schema import (
        MultiPatchGANConfig,
    )
    from heuristique_style_transfer_code_tpu.models.multi_patchgan import (
        multiscale_apply,
        multiscale_init,
    )

    cfg = MultiPatchGANConfig()
    b3 = 32
    v3 = multiscale_init(
        jax.random.PRNGKey(1), cfg.patch_sizes, ndf=cfg.ndf,
        num_classes=cfg.num_classes, norm=cfg.norm,
    )
    n_params = sum(
        x.size for x in jax.tree_util.tree_leaves(v3) if hasattr(x, "size")
    )

    def fwd3(v, images):
        return multiscale_apply(
            v, images.astype(jnp.bfloat16), norm=cfg.norm, train=True
        )

    t3 = measure_train_step(fwd3, v3, b3)
    print(
        f"family-3 multi-patchgan train (bf16, b{b3}, 224^2, "
        f"{n_params / 1e6:.1f}M params): "
        f"{t3 * 1e3:.2f} ms/step -> {b3 / t3:.0f} img/s"
    )


if __name__ == "__main__":
    main()
