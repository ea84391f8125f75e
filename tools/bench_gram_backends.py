"""Benchmark the Gram backends (XLA einsum vs Pallas VMEM kernels) on the
real chip at the model's shapes.

The ``HST_GRAM_BACKEND=pallas`` knob (ops/gram.py, ops/pallas/gram_kernel.py)
has been numerics-tested since round 1 but never timed on hardware — this
probe records the comparison PERF.md cites. Method: scan-slope (PERF.md) —
time an on-device ``lax.scan`` of N kernel applications at two N values and
take the slope, so the relay RTT cancels. Inputs cycle through 3 distinct
pre-staged batches (the relay compresses repeated data).

Shapes measured (the ones the models actually run):
- style-transfer grams (tasks/style_transfer.py, truncate-5): full C x C
  Grams of the stem/layer1 activations.
- family-2 pooled grams (models/gram_attention.py, truncate-8): S=7 pooled
  Grams of each block output via the (Pf)(Pf)^T identity.

Usage: python tools/bench_gram_backends.py  (TPU; ~2 min warm)
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def scan_slope(fn, shape, n1=40, n2=200, k=3):
    """Per-application seconds of ``fn`` via an on-device scan slope.

    Inputs are GENERATED on device (k distinct random batches cycled by the
    scan): nothing large crosses the relay — the axon remote-compile rejects
    programs with multi-hundred-MB staged arguments (HTTP 413) — and the
    generation cost is identical at both N values, so it cancels in the
    slope along with the RTT."""

    def step(c, i):
        xs, acc = c
        x = jax.lax.dynamic_index_in_dim(xs, i % k, 0, keepdims=False)
        y = fn(x)
        # fold the output into a scalar carry so nothing is dead code
        return (xs, acc + jnp.sum(y.astype(jnp.float32))), None

    @functools.partial(jax.jit, static_argnums=1)
    def run(key, n):
        xs = jax.random.normal(key, (k,) + shape, jnp.float32)
        (_, c), _ = jax.lax.scan(
            step, (xs, jnp.zeros((), jnp.float32)), jnp.arange(n)
        )
        return c

    key = jax.random.PRNGKey(0)
    ts = {}
    for n in (n1, n2):
        np.asarray(run(key, n))  # compile + warm
        t0 = time.perf_counter()
        np.asarray(run(key, n))
        ts[n] = time.perf_counter() - t0
    return (ts[n2] - ts[n1]) / (n2 - n1)


def main():
    from heuristique_style_transfer_code_tpu.ops import gram
    from heuristique_style_transfer_code_tpu.ops.pallas import gram_kernel

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")

    cases = [
        # (label, kind, (B, H, W, C), S)
        ("style stem 112x112x64 b8", "gram", (8, 112, 112, 64), None),
        ("style layer1 56x56x256 b8", "gram", (8, 56, 56, 256), None),
        ("style layer1 56x56x256 b64", "gram", (64, 56, 56, 256), None),
        ("fam2 layer1 56x56x256 S7 b64", "pooled", (64, 56, 56, 256), 7),
        ("fam2 layer2 28x28x512 S7 b64", "pooled", (64, 28, 28, 512), 7),
        ("fam2 layer3 14x14x1024 S7 b64", "pooled", (64, 14, 14, 1024), 7),
        ("fam2 layer4 7x7x2048 S7 b64", "pooled", (64, 7, 7, 2048), 7),
    ]
    print(f"{'case':36} {'xla ms':>9} {'pallas ms':>10} {'pallas/xla':>10}")
    for label, kind, shape, s in cases:
        if kind == "gram":
            f_x = gram.gram_matrix_nhwc
            f_p = gram_kernel.gram_pallas
        else:
            f_x = functools.partial(gram.pooled_gram_nhwc, out_size=s, backend="xla")
            f_p = functools.partial(gram_kernel.pooled_gram_pallas, out_size=s)
        # numerics check once per case (small transfer: batch 2 slice)
        x0 = jnp.asarray(
            rng.standard_normal((2,) + shape[1:], dtype=np.float32)
        )
        a = np.asarray(jax.jit(f_x)(x0))
        b = np.asarray(jax.jit(f_p)(x0))
        err = float(np.max(np.abs(a - b)) / (np.max(np.abs(a)) + 1e-9))
        t_x = scan_slope(f_x, shape)
        t_p = scan_slope(f_p, shape)
        print(
            f"{label:36} {t_x*1e3:9.3f} {t_p*1e3:10.3f} {t_p/t_x:10.2f}"
            f"   relerr={err:.2e}"
        )


if __name__ == "__main__":
    main()
