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


# Per-core VMEM the kernel may claim. The input and output blocks are both
# whole-image resident and Mosaic double-buffers them across the batch grid,
# so the working set is ~4x one block (+ small f32 chunk temporaries). 16 MiB
# is the common per-core floor across TPU generations; exceeding it fails
# Mosaic compilation with an opaque allocation error, so we pre-check and
# raise a descriptive ValueError instead (callers fall back to the XLA
# composition in nn/transformer_net._in_apply).
VMEM_BUDGET_BYTES = 16 * 2 ** 20


def _row_chunk(rows: int, cap: int = 4096) -> int:
    """Largest divisor of ``rows`` not exceeding ``cap`` (static)."""
    best = 1
    for d in range(1, int(rows) + 1):
        if rows % d == 0 and d <= cap:
            best = d
    return best


# When rows has no divisor near the cap (e.g. prime after an unusual H*W*C),
# _row_chunk degenerates toward 1 and the fori_loop would run one 128-lane
# row per iteration — correct but pathologically slow. Below this floor we
# instead pad the flat view to a chunk-friendly row count and mask the tail
# out of the statistics (padded output rows are sliced off afterwards).
_CHUNK_FLOOR = 256


def _in_kernel(x_ref, s_ref, b_ref, o_ref, *, hw: int, c: int, g: int,
               chunk: int, eps: float, relu: bool, valid_rows: int):
    rows = x_ref.shape[1]
    nchunks = rows // chunk
    padded = valid_rows != rows  # static: tail rows are zero padding

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

    # pass B: two-pass variance (mean of squared deviations). Zero padding
    # is invisible to pass A's sums but would contribute mean² here, so the
    # tail rows are masked out of the deviations.
    def body_var(i, acc):
        xv = x_ref[0, pl.ds(i * chunk, chunk), :].astype(jnp.float32)
        d = xv - mean_t
        if padded:
            r = i * chunk + jax.lax.broadcasted_iota(jnp.int32, (chunk, 128), 0)
            d = jnp.where(r < valid_rows, d, 0.0)
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
    valid_rows = rows
    if chunk < min(rows, _CHUNK_FLOOR):
        # divisor-poor row count: pad the flat view to a multiple of a
        # healthy chunk and mask the tail out of the statistics
        chunk = min(rows, 2048)
        padded_rows = -(-rows // chunk) * chunk
        xf = jnp.pad(xf, ((0, 0), (0, padded_rows - rows), (0, 0)))
        rows = padded_rows
    # input + output whole-image blocks, double-buffered across the grid,
    # plus the f32 chunk temporaries of the three passes
    need = 4 * rows * 128 * x.dtype.itemsize + 3 * chunk * 128 * 4
    if need > VMEM_BUDGET_BYTES:
        raise ValueError(
            f"instance_norm_pallas: per-image working set ~{need / 2**20:.1f}"
            f" MiB ({h}x{w}x{c} {x.dtype}) exceeds the {VMEM_BUDGET_BYTES // 2**20}"
            " MiB VMEM budget — the kernel keeps the whole image VMEM-resident;"
            " use the XLA instance-norm composition (in_backend='xla') for"
            " crops this large"
        )
    kernel = functools.partial(
        _in_kernel, hw=hw, c=c, g=g, chunk=chunk, eps=float(eps),
        relu=bool(relu), valid_rows=valid_rows,
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
    if valid_rows != rows:
        out = out[:, :valid_rows]
    return out.reshape(b, h, w, c)
