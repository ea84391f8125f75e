"""Pallas TPU kernel: fused instance norm (+affine, +optional ReLU).

Motivation (PERF.md r4, tools/bench_net_forward_trace.py): the fast-style
net forward is instance-norm bound — IN f32 statistics 46.8% + the
normalise apply 21.7% of device time vs 19.0% for the convolutions. XLA
executes IN as a stats pass (read x) followed by an apply pass (read x
again, write y): 2 HBM reads + 1 write of every activation tensor. This
kernel keeps the WHOLE image resident in VMEM — one grid program per batch
element — so the statistics and the apply share a single HBM read: 1R+1W,
cutting the IN traffic ~33%.

Layout: the (H, W, C) image is viewed as a dense ``(H*W*C/128, 128)`` flat
row-major array — no data movement, and the 128 lanes are fully dense for
every net width (C ∈ {32, 64, 128}; for C < 128 each lane row packs
``g = 128/C`` consecutive spatial positions, so per-channel statistics fold
the (g, C) groups and the affine broadcasts as a g-fold tile). Statistics
are two-pass f32 (mean, then mean of squared deviations — the repo-wide
precision rule; E[x²]−E[x]² is never used). In-kernel the rows are chunked
through an fori_loop so the f32 temporaries stay ~2 MB regardless of image
size; VMEM holds in+out blocks (≤3.2 MB each at 224²×32 bf16) plus chunks,
double-buffered across the batch grid.

The XLA composition (nn/transformer_net._in_apply) remains the default and
the gradient path; this kernel is forward-only serving acceleration,
selected via ``HST_NET_IN_BACKEND=pallas`` (see transformer_net). Validated
against the XLA path in tests (interpret mode on CPU, compiled on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only at runtime but imports everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    PALLAS_AVAILABLE = True
except Exception:  # pragma: no cover
    PALLAS_AVAILABLE = False


def _row_chunk(rows: int, cap: int = 4096) -> int:
    """Largest divisor of ``rows`` not exceeding ``cap`` (static)."""
    best = 1
    for d in range(1, int(rows) + 1):
        if rows % d == 0 and d <= cap:
            best = d
    return best


def _in_kernel(x_ref, s_ref, b_ref, o_ref, *, hw: int, c: int, g: int,
               chunk: int, eps: float, relu: bool):
    rows = x_ref.shape[1]
    nchunks = rows // chunk

    # The g-fold group fold/tile between the (1, 128) lane row and the
    # (1, C) channel vector is done with a tiny 0/1 matmul — Mosaic rejects
    # lane->sublane shape casts ((128,) -> (g, C)), but contractions mix
    # lanes freely. F[j, ch] = 1 iff lane j carries channel ch.
    jj = jax.lax.broadcasted_iota(jnp.int32, (128, c), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (128, c), 1)
    fold_mat = (jj % c == cc).astype(jnp.float32)

    def fold(v128):  # (1, 128) lane row -> (1, C) per-channel fold
        return jax.lax.dot_general(
            v128, fold_mat, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def tile(vc):  # (1, C) -> (1, 128) g-fold tile
        return jax.lax.dot_general(
            vc, fold_mat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # pass A: per-channel sum -> mean (f32)
    def body_sum(i, acc):
        xv = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        return acc + fold(jnp.sum(xv, axis=0, keepdims=True))

    total = jax.lax.fori_loop(
        0, nchunks, body_sum, jnp.zeros((1, c), jnp.float32)
    )
    mean = total / float(hw)
    mean_t = tile(mean)

    # pass B: two-pass variance (mean of squared deviations)
    def body_var(i, acc):
        xv = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        d = xv - mean_t
        return acc + fold(jnp.sum(d * d, axis=0, keepdims=True))

    var = jax.lax.fori_loop(
        0, nchunks, body_var, jnp.zeros((1, c), jnp.float32)
    ) / float(hw)
    inv = jax.lax.rsqrt(var + eps)

    a = inv * s_ref[0].astype(jnp.float32)  # (1, C)
    b = b_ref[0].astype(jnp.float32) - mean * a
    a_t, b_t = tile(a), tile(b)

    # pass C: normalise + affine (+relu), one write
    def body_out(i, _):
        xv = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        y = xv * a_t + b_t
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0, pl.ds(i * chunk, chunk), :] = y.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, nchunks, body_out, 0)


def instance_norm_pallas(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    *,
    eps: float = 1e-5,
    relu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """Fused affine instance norm: ``x`` (B, H, W, C), ``scale``/``bias``
    (B, C) f32 per-image affines (broadcast a shared affine to (B, C) at
    the caller — conditional nets already produce per-image rows). Returns
    the same shape/dtype as ``x``. Statistics are f32 two-pass regardless
    of ``x.dtype``; the apply matches the XLA composition to ~1 ULP of the
    compute dtype."""
    if not PALLAS_AVAILABLE:  # pragma: no cover
        raise RuntimeError("pallas unavailable in this jax install")
    b, h, w, c = x.shape
    if 128 % c:
        raise ValueError(
            f"instance_norm_pallas needs a channel count dividing 128, got {c}"
        )
    g = 128 // c
    hw = h * w
    if (hw * c) % 128:
        raise ValueError(f"H*W*C must divide by 128, got {h}x{w}x{c}")
    rows = hw * c // 128
    chunk = _row_chunk(rows)
    xf = x.reshape(b, rows, 128)
    kernel = functools.partial(
        _in_kernel, hw=hw, c=c, g=g, chunk=chunk, eps=float(eps),
        relu=bool(relu),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, C) with a (1, 1, C) block: the last two block dims
            # equal the array dims, which the TPU lowering accepts for
            # sub-(8,128) shapes
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, rows, 128), x.dtype),
        interpret=interpret,
    )(
        xf,
        scale.astype(jnp.float32).reshape(b, 1, c),
        bias.astype(jnp.float32).reshape(b, 1, c),
    )
    return out.reshape(b, h, w, c)
