"""Name the fast-style net forward's bound and measure one lift attempt.

PERF.md's round-3 entry said "~24 TFLOP/s effective (instance-norm two-pass
stats + reflect pads ... HBM traffic)" in one sentence; this tool does what
every other hot path got:

1. scan-slope the b64 224² bf16 forward (the serving program),
2. capture a jax.profiler xplane trace and aggregate the per-op self times
   from the trace-viewer events (same method as the forward/train/style
   profiles in PERF.md),
3. measure the candidate lift: `_in_apply` normalises the FULL tensor in
   f32 even under bf16 compute — folding the affine into two f32 broadcast
   scalars applied in the compute dtype (statistics stay f32) cuts the
   elementwise traffic in half. Variant B here mirrors that one-line
   change; ship it only if this measures a win.

Usage: python tools/bench_net_forward_trace.py   (real TPU)
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import tempfile
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


def folded_in_apply(p, x, style_w=None, eps: float = 1e-5):
    """Variant B: f32 statistics, affine folded into two broadcast scalars
    applied in x's dtype — halves the elementwise HBM traffic under bf16."""
    import jax
    import jax.numpy as jnp

    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    scale, bias = p["scale"], p["bias"]
    if scale.ndim == 2:
        w = style_w.astype(jnp.float32)
        scale = (w @ scale)[:, None, None, :]
        bias = (w @ bias)[:, None, None, :]
    a = inv * scale
    b = bias - mean * a
    return (x * a.astype(x.dtype) + b.astype(x.dtype)).astype(x.dtype)


def trace_op_times(trace_dir: str) -> dict:
    """Aggregate per-op-category self time from the trace-viewer JSON the
    profiler writes (xplane -> trace_json.gz)."""
    files = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not files:
        return {}
    with gzip.open(sorted(files)[-1], "rt") as f:
        events = json.load(f).get("traceEvents", [])
    # device lanes only: resolve pids whose process_name metadata mentions
    # the device — host threads carry python/runtime names we don't want
    device_pids = {
        e.get("pid")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and any(
            s in str((e.get("args") or {}).get("name", "")).lower()
            for s in ("tpu", "device", "xla")
        )
    }
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        key = e.get("name", "").split(".")[0].split("(")[0][:40]
        agg[key] = agg.get(key, 0.0) + e["dur"] / 1e3  # ms
    return dict(sorted(agg.items(), key=lambda kv: -kv[1])[:25])


def main():
    import jax
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.core.cache import (
        enable_compile_cache,
    )

    enable_compile_cache()

    from heuristique_style_transfer_code_tpu.nn import transformer_net as tn

    print(f"devices: {jax.devices()}", file=sys.stderr)
    rng = np.random.RandomState(0)
    net = tn.transformer_net_init(jax.random.PRNGKey(0), width=32, n_res=5)
    b = 64
    x = jnp.asarray(
        ((rng.rand(b, 224, 224, 3).astype(np.float32) - 0.45) / 0.22)
    )

    def step(carry):
        return tn.transformer_net_apply(carry_params, carry,
                                        compute_dtype=jnp.bfloat16)

    results = {}
    original = tn._in_apply
    for variant, in_apply in (("two_pass_f32_apply", original),
                              ("folded_bf16_apply", folded_in_apply)):
        tn._in_apply = in_apply
        try:
            carry_params = net

            def step_v(carry):
                return tn.transformer_net_apply(
                    net, carry, compute_dtype=jnp.bfloat16
                )

            dt = scan_slope(step_v, x)
            results[variant] = {
                "ms_per_img": round(dt * 1e3 / b, 4),
                "img_per_s": round(b / dt, 1),
            }
            print(f"{variant}: {dt * 1e3 / b:.4f} ms/img "
                  f"({b / dt:.0f} img/s)", file=sys.stderr)
            # numerical agreement of the variant against the baseline
            if variant != "two_pass_f32_apply":
                tn._in_apply = original
                ref = np.asarray(
                    jax.jit(lambda p, q: tn.transformer_net_apply(
                        p, q, compute_dtype=jnp.bfloat16))(net, x[:4])
                )
                tn._in_apply = in_apply
                got = np.asarray(
                    jax.jit(lambda p, q: tn.transformer_net_apply(
                        p, q, compute_dtype=jnp.bfloat16))(net, x[:4])
                )
                results[variant]["max_abs_diff_norm_space"] = round(
                    float(np.abs(ref - got).max()), 5
                )
        finally:
            tn._in_apply = original

    # xplane trace of the baseline scan (20 forwards)
    trace_dir = tempfile.mkdtemp(prefix="net_trace_")
    fwd = jax.jit(lambda q: jax.lax.scan(
        lambda c, _: (tn.transformer_net_apply(
            net, c, compute_dtype=jnp.bfloat16), None),
        q, None, length=20)[0])
    np.asarray(fwd(x)).ravel()[:1]  # compile outside the trace
    with jax.profiler.trace(trace_dir):
        np.asarray(fwd(x)).ravel()[:1]
    ops = trace_op_times(trace_dir)
    print(json.dumps({"variants": results, "trace_dir": trace_dir,
                      "top_ops_ms": ops}))


if __name__ == "__main__":
    main()
