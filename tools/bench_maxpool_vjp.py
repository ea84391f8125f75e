"""A/B the stem maxpool backward: XLA select-and-scatter vs argmax VJP.

PERF.md's xplane traces show the stem pool's select-and-scatter gradient
running ~4-5x off the HBM roofline (0.9 ms of the b128 train step, and the
maxpool rows are 1.77 ms of the 12.0 ms b64 style iteration combined with
the forward). `ops.conv.max_pool2d_argmax` replaces that backward with
kh*kw fused strided pads driven by a first-max index map recorded in the
forward (identical tie-breaking; grads equal up to f32 summation grouping
at multi-window maxima — tests/test_ops_golden.py).

This tool measures the two hot differentiated paths with each
implementation (same scan-slope method as bench.py, RTT cancels):
  - flagship train step (b128, bf16, truncate 8)
  - style-transfer while_loop (b64 and b128, bf16 encoder, truncate 5)

Usage: python tools/bench_maxpool_vjp.py   (real TPU; ~6 min warm)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _flagship_variables():
    import jax

    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        classifier_init,
        truncated_moco_init,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    return {
        "moco": truncated_moco_init(k1, 8, dim=256),
        "classifier": classifier_init(k2, 256, 4),
    }


def measure_train(variables):
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        combined_apply,
    )
    from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
    from heuristique_style_transfer_code_tpu.train.train_loop import (
        make_train_step_body,
    )

    batch, truncate = 128, 8
    optimizer = sgd_momentum(0.01, variables)
    augment = make_augment_fn(
        [(None, None), ("horizontal_flip", "brightness")], crop=224
    )

    def forward_train(v, images):
        logits, new_moco = combined_apply(
            v["moco"], v["classifier"], images.astype(jnp.bfloat16),
            truncate, train=True,
        )
        return logits, {"moco": new_moco, "classifier": v["classifier"]}

    one_step = make_train_step_body(forward_train, optimizer, augment)

    rng = np.random.RandomState(7)
    stack3 = jnp.asarray(
        rng.randint(0, 256, (3, batch, 256, 256, 3), dtype=np.uint8)
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
    loss_tail = None
    for n in (2, 10):
        fn = make_scan(n)
        loss_tail = float(np.asarray(fn(variables, o0, stack3, jax.random.PRNGKey(1)))[-1])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fn(variables, o0, stack3, jax.random.PRNGKey(1)))
            ts.append(time.perf_counter() - t0)
        times[n] = float(np.median(ts))
    t_step = (times[10] - times[2]) / 8
    return t_step, batch, loss_tail


def measure_style(variables, b):
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.core.dtypes import BF16_POLICY
    from heuristique_style_transfer_code_tpu.nn.resnet import resnet50_apply
    from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc
    from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
        make_style_transfer_optimizer,
    )

    enc_bf16 = BF16_POLICY.cast_to_compute(variables["moco"]["encoder"])

    def gram_fn(imgs):
        feats, _, _ = resnet50_apply(enc_bf16, imgs.astype(jnp.bfloat16), truncate=5)
        return [gram_matrix_nhwc(feats)]

    target_img = jax.random.uniform(jax.random.PRNGKey(1), (b, 224, 224, 3))
    targets = [t.astype(jnp.float32) for t in gram_fn(target_img)]
    noise0 = jax.random.normal(jax.random.PRNGKey(2), (b, 224, 224, 3))
    times = {}
    loss_tail = None
    for n_it in (50, 250):
        opt = make_style_transfer_optimizer(gram_fn, 0.01, n_it, threshold=0.0)
        _, _, loss = opt(noise0, targets)
        loss_tail = float(np.asarray(loss).ravel()[0])
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, _, loss = opt(noise0, targets)
            np.asarray(loss)
            ts.append(time.perf_counter() - t0)
        times[n_it] = float(np.median(ts))
    per_iter = (times[250] - times[50]) / 200
    return per_iter, loss_tail


def main():
    import jax

    from heuristique_style_transfer_code_tpu.core.cache import enable_compile_cache

    enable_compile_cache()

    from heuristique_style_transfer_code_tpu.nn import resnet
    from heuristique_style_transfer_code_tpu.ops.conv import (
        max_pool2d,
        max_pool2d_argmax,
    )

    print(f"devices: {jax.devices()}")
    variables = _flagship_variables()

    for name, impl in (("xla_sas", max_pool2d), ("argmax_vjp", max_pool2d_argmax)):
        resnet.max_pool2d = impl
        t_step, batch, loss = measure_train(variables)
        print(
            f"[{name}] train b{batch} bf16: {t_step * 1e3:.2f} ms/step "
            f"-> {batch / t_step:.0f} img/s   (loss[-1]={loss:.6f})"
        )
        for b in (64, 128):
            per_iter, sloss = measure_style(variables, b)
            print(
                f"[{name}] style b{b} bf16: {per_iter * 1e3:.2f} ms/iter "
                f"-> {b / per_iter:.0f} img-it/s   (loss={sloss:.6f})"
            )
    resnet.max_pool2d = max_pool2d


if __name__ == "__main__":
    main()
