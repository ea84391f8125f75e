"""Ahead-of-time HBM autotuning for the train step (``--auto_batch``).

The reference (and eager torch generally) discovers that a batch does not
fit by dying with a CUDA OOM at some point during the first epoch. Under
XLA the peak memory of the EXACT program the trainer will dispatch is a
compile-time fact: ``jit(step).lower(shapes).compile().memory_analysis()``
returns it without executing anything or allocating the activations. This
module turns that into a knob: probe candidate batch sizes ahead of time
and adopt the largest one that fits the device's HBM.

Probes are pure compiles — with the persistent compile cache (core/cache.py,
default on) repeat runs pay nothing, and the probe of the batch that is
adopted IS the training compile, so it is never wasted. Memory is monotone
in batch size for this step (everything batched scales linearly; weights
don't), so the search stops at the first candidate over budget.

Verified on the real chip (2026-08): ``compiled.memory_analysis()`` works
under the axon TPU backend (peak_memory_in_bytes populated), but
``device.memory_stats()`` returns None through the relay — pass
``--hbm_budget_gb`` there. Directly-attached TPUs report ``bytes_limit``
and need no flag.
"""
from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

GIB = float(1 << 30)


def device_hbm_bytes(device=None) -> Optional[int]:
    """The accelerator's memory budget in bytes, or None when the backend
    does not report one (XLA:CPU returns None — tests pass an explicit
    budget)."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return None
    if not stats:
        return None
    return stats.get("bytes_limit")


def train_step_peak_bytes(
    train_step,
    state_shapes: Tuple,
    batch: int,
    canvas: int,
) -> int:
    """Peak device bytes of one compiled train step at ``batch``:
    temp (activations/workspace) + argument buffers. ``train_step`` is the
    jitted 6-arg step the CLIs dispatch (train_loop.make_train_step:
    variables, opt_state, staged uint8 images, labels, combo ids, rng key);
    ``state_shapes`` is (variables, opt_state) as ShapeDtypeStructs
    (``jax.eval_shape(setup.init, key)`` — no arrays materialised)."""
    variables, opt_state = state_shapes
    args = (
        variables,
        opt_state,
        jax.ShapeDtypeStruct((batch, canvas, canvas, 3), jnp.uint8),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((batch,), jnp.int32),
        jax.ShapeDtypeStruct((2,), jnp.uint32),
    )
    m = train_step.lower(*args).compile().memory_analysis()
    # Backends disagree on what peak_memory_in_bytes covers (measured: the
    # TPU backend includes argument buffers, XLA:CPU does not), so take the
    # conservative max of it and the explicit sum. Outputs alias the donated
    # state (donate_argnums), so only the non-aliased output remainder adds.
    temp = int(m.temp_size_in_bytes)
    args_b = int(m.argument_size_in_bytes)
    out_extra = max(0, int(m.output_size_in_bytes) - int(m.alias_size_in_bytes))
    peak = int(getattr(m, "peak_memory_in_bytes", 0) or 0)
    return max(peak, temp + args_b + out_extra)


def batch_candidates(
    base: int, divisor: int = 1, max_batch: int = 4096
) -> Tuple[int, ...]:
    """Doubling ladder from the configured batch upward: base, 2·base, ...
    ≤ max_batch, each rounded up to a multiple of ``divisor`` (the data-mesh
    axis, so every candidate shards evenly)."""
    assert base >= 1 and divisor >= 1
    out, b = [], base
    while b <= max_batch:
        c = int(math.ceil(b / divisor) * divisor)
        if not out or c > out[-1]:
            out.append(c)
        b *= 2
    return tuple(out)


def autotune_batch(
    measure: Callable[[int], int],
    budget_bytes: int,
    candidates: Sequence[int],
    safety: float = 0.95,
) -> Tuple[Optional[int], Dict[int, Optional[int]]]:
    """Largest candidate whose ``measure(batch)`` ≤ ``safety·budget``.

    Probes ascending and stops at the first miss (peak bytes are monotone
    in batch). A probe that RAISES (the compiler itself refusing the
    allocation) counts as a miss. Returns (chosen_or_None, {batch: peak
    bytes or None-if-raised}) — chosen is None when even the smallest
    candidate does not fit."""
    chosen: Optional[int] = None
    report: Dict[int, Optional[int]] = {}
    limit = budget_bytes * safety
    for b in sorted(set(int(c) for c in candidates)):
        try:
            peak = int(measure(b))
        except Exception:
            report[b] = None
            break
        report[b] = peak
        if peak <= limit:
            chosen = b
        else:
            break
    return chosen, report


def describe_report(
    report: Dict[int, Optional[int]], budget_bytes: int, safety: float = 0.95
) -> str:
    lines = [
        f"HBM budget {budget_bytes / GIB:.2f} GiB "
        f"(safety margin {safety:.0%} -> {budget_bytes * safety / GIB:.2f} GiB usable)"
    ]
    for b in sorted(report):
        peak = report[b]
        if peak is None:
            lines.append(f"  batch {b}: compile refused the allocation")
        else:
            fits = "fits" if peak <= budget_bytes * safety else "over budget"
            lines.append(f"  batch {b}: peak {peak / GIB:.2f} GiB -> {fits}")
    return "\n".join(lines)
