"""Pipeline parallelism (GPipe schedule) for the flagship classifier.

The reference has no distributed path at all (SURVEY.md §2.4); round 2 added
dp + tp + sp meshes (parallel/sharding.py). This module completes the axis
set with **pp**: the truncate-8 TruncatedMoCoV3 + classifier
(Models/Models_RESNET50_TRUNCATE.py:5-54) split into S depth stages laid out
along a ``'pipe'`` mesh axis, trained with GPipe microbatching. (ep is N/A —
no model family has MoE routing.)

TPU-native design — the whole schedule is ONE compiled program:

- **Per-stage placement despite heterogeneous stages.** ResNet stages have
  different parameter counts and shapes, which naive ``P('pipe')`` sharding
  of a stacked tree cannot express. Each stage's param tree is packed into a
  flat f32 buffer padded to the widest stage, stacked ``(S, maxP)`` and
  sharded ``P('pipe', None)`` — so each device physically holds only its own
  stage's weights. Inside ``shard_map`` a ``lax.switch`` on
  ``axis_index('pipe')`` statically unpacks the local buffer with that
  stage's shapes and runs that stage's compute.
- **The GPipe tick loop is a ``lax.scan``.** T = M + S - 1 ticks; at tick t
  device s runs microbatch ``t - s`` (predicated: bubble ticks compute on
  dead data and are masked out of the loss, stats and outputs, exactly like
  hardware pipeline bubbles). Fixed-size activation buffers move stage to
  stage with ``lax.ppermute`` over ICI.
- **The reverse pipeline is autodiff.** ``jax.value_and_grad`` through the
  scan + ppermute + switch yields the backward schedule automatically
  (ppermute transposes to the reversed ring); no hand-written backward pass.
- **Stat-only scan carry.** The packed stage weights are loop constants of
  the tick scan (SGD applies after the schedule); only the BN running-stat
  slice (KBs) is carried and chained tick to tick. Carrying the full packed
  row would write + checkpoint tens of MBs of unchanged weights per tick —
  per-tick HBM traffic on a real slice, and measured 10 GB RSS / 14-minute
  steps on the 8-virtual-device CPU mesh vs <1 GB with this design.
- **dp x pp composition.** The mesh is ``('data', 'pipe')``: each data shard
  runs its own pipeline over its microbatches; gradients are ``pmean``-ed
  over 'data' after the local backward, BN running-stat chains are averaged.

Semantics notes (standard for pipeline training, documented deviations from
the single-device step):
- BatchNorm normalises per *microbatch* (micro-batch BN); running stats are
  updated sequentially over a shard's microbatches with torch momentum
  semantics and averaged across data shards.
- The step loss is the mean of per-microbatch masked-CE means (equal to the
  global batch mean when microbatches are pad-free and equally sized).

The optimiser is the reference's SGD(momentum=0.9) over trainable leaves
(train_best_RESNET50_Truncate.py:191-194), applied directly on the flat
buffers with a packed trainability mask.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import DATA_AXIS

PIPE_AXIS = "pipe"

# Flagship depth units at BLOCK granularity: stem | each bottleneck block |
# heads. 18 units for truncate-8, so stage counts up to 18 are expressible
# and the contiguous grouping can balance stages by packed-parameter bytes
# (layer4 alone is 15M of the flagship's 25.5M params — layer-granularity
# stages force maxP to 15.5M; block granularity gets it to ~7.5M at S=4,
# which halves every padded per-device buffer: the packed row, its gradient
# accumulator and the optimiser state).
from ..nn.resnet import _STAGES as _RESNET_STAGES  # (name, blocks, width, stride)


@dataclasses.dataclass(frozen=True)
class PipelineUnits:
    """Pluggable depth decomposition: ``trees(variables)`` -> per-unit
    disjoint-key param dicts, ``apply(i, p, x, train)`` -> (y, new_or_None),
    ``rebuild(merged)`` -> the original variables tree. The default
    (``FLAGSHIP_UNITS``) is the truncate-8 flagship; tests plug a tiny CNN
    (full-flagship equality is rendezvous-budget-hostile on 1-core virtual
    meshes — see tests/test_pipeline.py)."""

    num_units: int
    trees: Any
    apply: Any
    rebuild: Any


def make_mesh_pipeline(n_devices: Optional[int] = None, pipe: int = 4) -> Mesh:
    """(data, pipe) mesh: 'pipe' carries the depth stages, the rest is DP."""
    devices = jax.devices()
    n = min(n_devices or len(devices), len(devices))
    assert n % pipe == 0, f"{n} devices not divisible by pipe={pipe}"
    grid = np.asarray(devices[:n]).reshape(n // pipe, pipe)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS))


# ---------------------------------------------------------------------------
# depth units of the family-1 flagship (any truncation with >= 1 res stage)


def make_flagship_units(truncate: int = 8) -> PipelineUnits:
    """Depth units of TruncatedMoCoV3 + classifier at ``truncate``
    (Models/Models_RESNET50_TRUNCATE.py:9-14, list(children())[:truncate]):
    stem | each included bottleneck block | heads. truncate 5..8 (at least
    layer1 kept — below that there is no depth to pipeline).

    Splits the tree {'moco': {'encoder', 'fc'}, 'classifier'} into
    disjoint-key block-granular units (block b of layerL keyed ``layerL_b``)
    so stage groups merge cleanly."""
    assert 5 <= truncate <= 8, truncate
    stages = _RESNET_STAGES[: truncate - 4]
    descs: Tuple[Tuple, ...] = (
        (("stem",),)
        + tuple(
            (name, b, st if b == 0 else 1)
            for name, nb, _, st in stages
            for b in range(nb)
        )
        + (("heads",),)
    )

    def trees(variables) -> List[Dict[str, Any]]:
        enc = variables["moco"]["encoder"]
        units: List[Dict[str, Any]] = [{"conv1": enc["conv1"], "bn1": enc["bn1"]}]
        for name, nb, _, _ in stages:
            for b in range(nb):
                units.append({f"{name}_{b}": enc[name][b]})
        units.append(
            {"moco_fc": variables["moco"]["fc"], "clf_fc": variables["classifier"]["fc"]}
        )
        return units

    def apply(i: int, p, x, train: bool):
        """Unit i forward. Returns (y, new_subtree_or_None); the new subtree
        has exactly the unit's keys (and p's leaf structure) so stage groups
        re-pack with the same meta."""
        from ..nn.resnet import _bottleneck_apply
        from ..ops.conv import conv2d, max_pool2d
        from ..ops.linear import linear
        from ..ops.norm import batch_norm
        from ..ops.pooling import global_avg_pool

        desc = descs[i]
        if desc[0] == "stem":
            h = conv2d(p["conv1"], x, stride=2, padding=3)
            if train:
                h, nb = batch_norm(p["bn1"], h, train=True)
            else:
                h = batch_norm(p["bn1"], h, train=False)
                nb = None
            h = jax.nn.relu(h)
            h = max_pool2d(h, 3, 2, 1)
            return h, ({"conv1": p["conv1"], "bn1": nb} if train else None)
        if desc[0] == "heads":
            logits = linear(p["clf_fc"], linear(p["moco_fc"], global_avg_pool(x)))
            new = {"moco_fc": p["moco_fc"], "clf_fc": p["clf_fc"]} if train else None
            return logits, new
        name, b, stride = desc
        h, nblk = _bottleneck_apply(p[f"{name}_{b}"], x, stride, train=train)
        return h, ({f"{name}_{b}": nblk} if train else None)

    def rebuild(merged: Dict[str, Any]) -> Dict[str, Any]:
        enc: Dict[str, Any] = {"conv1": merged["conv1"], "bn1": merged["bn1"]}
        for name, nb, _, _ in stages:
            enc[name] = [merged[f"{name}_{b}"] for b in range(nb)]
        return {
            "moco": {"encoder": enc, "fc": merged["moco_fc"]},
            "classifier": {"fc": merged["clf_fc"]},
        }

    return PipelineUnits(
        num_units=len(descs), trees=trees, apply=apply, rebuild=rebuild
    )


FLAGSHIP_UNITS = make_flagship_units(8)


def _group_bounds(n_units: int, n_stages: int) -> Tuple[Tuple[int, int], ...]:
    """Contiguous, near-even unit->stage grouping (by unit COUNT)."""
    assert 1 <= n_stages <= n_units
    base, extra = divmod(n_units, n_stages)
    bounds, lo = [], 0
    for s in range(n_stages):
        hi = lo + base + (1 if s < extra else 0)
        bounds.append((lo, hi))
        lo = hi
    return tuple(bounds)


def _balance_bounds(
    unit_sizes: Tuple[int, ...], n_stages: int
) -> Tuple[Tuple[int, int], ...]:
    """Contiguous unit->stage grouping minimising the largest stage's packed
    size (binary search on stage capacity + greedy fill). Every padded
    per-device buffer — the (maxP,) row, its gradient accumulator, the
    momentum state — is maxP wide, so maxP IS the pp memory footprint."""
    n = len(unit_sizes)
    assert 1 <= n_stages <= n
    lo, hi = max(unit_sizes), sum(unit_sizes)

    def groups_at(cap: int) -> int:
        groups, cur = 1, 0
        for s in unit_sizes:
            if cur + s > cap:
                groups, cur = groups + 1, s
            else:
                cur += s
        return groups

    while lo < hi:
        mid = (lo + hi) // 2
        if groups_at(mid) <= n_stages:
            hi = mid
        else:
            lo = mid + 1

    bounds, start, cur = [], 0, 0
    for i, s in enumerate(unit_sizes):
        if cur + s > lo and i > start:
            bounds.append((start, i))
            start, cur = i, s
        else:
            cur += s
    bounds.append((start, n))
    while len(bounds) < n_stages:  # greedy fill may under-shoot the count:
        # split the largest multi-unit stage at its best midpoint
        j = max(
            (k for k in range(len(bounds)) if bounds[k][1] - bounds[k][0] > 1),
            key=lambda k: sum(unit_sizes[bounds[k][0] : bounds[k][1]]),
        )
        lo_j, hi_j = bounds[j]
        best = min(
            range(lo_j + 1, hi_j),
            key=lambda m: max(
                sum(unit_sizes[lo_j:m]), sum(unit_sizes[m:hi_j])
            ),
        )
        bounds[j : j + 1] = [(lo_j, best), (best, hi_j)]
    return tuple(bounds)


# ---------------------------------------------------------------------------
# flat packing (heterogeneous stage trees -> fixed (S, maxP) buffer)


def _flatten(tree, dtype=jnp.float32):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    specs = tuple((tuple(l.shape), jnp.dtype(dtype)) for l in leaves)
    flat = jnp.concatenate([jnp.ravel(l).astype(dtype) for l in leaves])
    return flat, (treedef, specs)


def _unflatten(flat, meta):
    treedef, specs = meta
    leaves, off = [], 0
    for shape, dtype in specs:
        n = int(np.prod(shape)) if shape else 1
        leaves.append(flat[off : off + n].reshape(shape).astype(dtype))
        off += n
    return jax.tree_util.tree_unflatten(treedef, leaves)


@dataclasses.dataclass(frozen=True)
class PipelineSpec:
    num_stages: int
    microbatch: int
    image_size: int
    num_classes: int
    stage_units: Tuple[Tuple[int, int], ...]
    stage_metas: Tuple[Any, ...]
    stage_sizes: Tuple[int, ...]
    max_params: int
    stage_in_shapes: Tuple[Tuple[int, ...], ...]  # per-stage input (h, w, c)
    act_flat: int  # inter-stage buffer length (covers every boundary)
    # Per-stage BN-stat runs inside the packed row: (param_off, stat_off, n)
    # triples in flat order. Only this thin slice is carried through the
    # GPipe tick scan — the params themselves are loop constants (see
    # _gpipe_schedule), which keeps per-tick memory traffic at the size of
    # the stats (KBs), not the packed stage weights (tens of MBs).
    stage_stat_runs: Tuple[Tuple[Tuple[int, int, int], ...], ...] = ()
    max_stats: int = 1
    dtype: Any = jnp.float32  # flat-buffer/compute dtype (f64 for tests)
    units: PipelineUnits = FLAGSHIP_UNITS


def _stage_tree(units, lo: int, hi: int) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for i in range(lo, hi):
        tree.update(units[i])
    return tree


def make_pipeline_spec(
    variables,
    num_stages: int,
    microbatch: int,
    image_size: int,
    dtype=jnp.float32,
    units: Optional[PipelineUnits] = None,
    balance: str = "params",
) -> PipelineSpec:
    """Static plan: stage grouping, per-stage param metas/sizes, boundary
    activation shapes (chained ``jax.eval_shape`` — no dummy forward).

    ``balance='params'`` (default) groups units contiguously to minimise the
    widest stage's packed size (= per-device memory for the row, grads and
    momentum); ``'units'`` groups by unit count."""
    from ..train.optim import BN_STAT_KEYS, _leaf_name

    u = units or FLAGSHIP_UNITS
    unit_trees = u.trees(variables)
    if balance == "params":
        unit_sizes = tuple(
            sum(
                int(np.prod(l.shape)) if l.shape else 1
                for l in jax.tree_util.tree_leaves(t)
            )
            for t in unit_trees
        )
        stage_units = _balance_bounds(unit_sizes, num_stages)
    elif balance == "units":
        stage_units = _group_bounds(u.num_units, num_stages)
    else:
        raise ValueError(f"balance must be 'params' or 'units', got {balance!r}")

    metas, sizes, stat_runs = [], [], []
    for lo, hi in stage_units:
        tree = _stage_tree(unit_trees, lo, hi)
        flat, meta = _flatten(tree, dtype)
        metas.append(meta)
        sizes.append(int(flat.size))
        # static (param_off, stat_off, n) runs of the BN-stat leaves in flat
        # order (tree_flatten_with_path matches tree_flatten's leaf order)
        runs, poff, soff = [], 0, 0
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            if _leaf_name(path) in BN_STAT_KEYS:
                runs.append((poff, soff, n))
                soff += n
            poff += n
        stat_runs.append(tuple(runs))

    x = jax.ShapeDtypeStruct((microbatch, image_size, image_size, 3), dtype)
    in_shapes, boundary = [], []
    for lo, hi in stage_units:
        in_shapes.append(tuple(int(d) for d in x.shape[1:]))
        boundary.append(int(np.prod(x.shape)))
        for i in range(lo, hi):
            x = jax.eval_shape(
                functools.partial(u.apply, i, train=False), unit_trees[i], x=x
            )[0]
    boundary.append(int(np.prod(x.shape)))  # final logits
    num_classes = int(x.shape[-1])

    return PipelineSpec(
        num_stages=num_stages,
        microbatch=microbatch,
        image_size=image_size,
        num_classes=num_classes,
        stage_units=stage_units,
        stage_metas=tuple(metas),
        stage_sizes=tuple(sizes),
        max_params=max(sizes),
        stage_in_shapes=tuple(in_shapes),
        act_flat=max(boundary),
        stage_stat_runs=tuple(stat_runs),
        max_stats=max(
            [1] + [sum(n for _, _, n in runs) for runs in stat_runs]
        ),
        dtype=jnp.dtype(dtype),
        units=u,
    )


def pack_pipeline_params(spec: PipelineSpec, variables) -> jax.Array:
    """(S, maxP) stack, one padded row per stage — shard P('pipe', None)."""
    units = spec.units.trees(variables)
    rows = []
    for lo, hi in spec.stage_units:
        flat, _ = _flatten(_stage_tree(units, lo, hi), spec.dtype)
        rows.append(jnp.pad(flat, (0, spec.max_params - flat.size)))
    return jnp.stack(rows)


def unpack_pipeline_params(spec: PipelineSpec, stacked) -> Dict[str, Any]:
    """Inverse of pack: rebuild the variables tree (for checkpoint IO /
    equality checks)."""
    merged: Dict[str, Any] = {}
    for s in range(spec.num_stages):
        merged.update(
            _unflatten(stacked[s][: spec.stage_sizes[s]], spec.stage_metas[s])
        )
    return spec.units.rebuild(merged)


def pack_pipeline_masks(spec: PipelineSpec, variables, frozen_fn=None):
    """(train_mask, stat_mask) as (S, maxP) f32 — the flat-buffer form of
    train/optim.label_tree (BN stats frozen; optional extra freezing).

    CAUTION: ``frozen_fn`` receives PACKED-UNIT paths ('clf_fc.kernel',
    'layer1_0.bn1.scale', ...), NOT the model-tree paths label_tree uses
    ('classifier.fc.kernel', 'moco.encoder.layer1.0...'). A predicate
    written for label_tree (e.g. factories.setup_gram_attention's
    freeze_encoder) will silently match nothing here — write the predicate
    against the unit names in ``spec.units`` instead."""
    from ..train.optim import BN_STAT_KEYS, _leaf_name, _path_str

    units = spec.units.trees(variables)
    t_rows, s_rows = [], []
    for lo, hi in spec.stage_units:
        leaves = jax.tree_util.tree_flatten_with_path(_stage_tree(units, lo, hi))[0]
        t_seg = np.zeros((spec.max_params,), np.float32)
        s_seg = np.zeros((spec.max_params,), np.float32)
        off = 0
        for path, leaf in leaves:
            n = int(np.prod(leaf.shape)) if leaf.shape else 1
            name = _leaf_name(path)
            is_stat = name in BN_STAT_KEYS
            frozen = is_stat or (frozen_fn is not None and frozen_fn(_path_str(path)))
            if not frozen:
                t_seg[off : off + n] = 1.0
            if is_stat:
                s_seg[off : off + n] = 1.0
            off += n
        t_rows.append(t_seg)
        s_rows.append(s_seg)
    return (
        jnp.asarray(np.stack(t_rows), dtype=spec.dtype),
        jnp.asarray(np.stack(s_rows), dtype=spec.dtype),
    )


# ---------------------------------------------------------------------------
# stage branches + GPipe tick schedule


def _splice_stats(spec: PipelineSpec, s: int, pflat, sflat):
    """Stage-s packed row with its BN-stat runs replaced by the carried
    ``sflat`` slice (all offsets static)."""
    runs = spec.stage_stat_runs[s]
    pcur = pflat[: spec.stage_sizes[s]]
    if not runs:
        return pcur
    segs, pos = [], 0
    for po, so, n in runs:
        segs.append(pcur[pos:po])
        segs.append(sflat[so : so + n])
        pos = po + n
    segs.append(pcur[pos:])
    return jnp.concatenate(segs)


def _extract_stats(spec: PipelineSpec, s: int, flat):
    """Stage-s BN-stat slice of a packed/stage-sized flat buffer, padded to
    the uniform (max_stats,) carry width."""
    runs = spec.stage_stat_runs[s]
    if not runs:
        return jnp.zeros((spec.max_stats,), spec.dtype)
    out = jnp.concatenate([flat[po : po + n] for po, _, n in runs])
    if out.size < spec.max_stats:
        out = jnp.concatenate(
            [out, jnp.zeros((spec.max_stats - out.size,), spec.dtype)]
        )
    return out


def _make_branch(spec: PipelineSpec, s: int, train: bool, remat: bool = False):
    """Uniform-signature stage program for ``lax.switch``:
    (pflat (maxP,), sflat (maxStats,), xflat (F,)) ->
    (yflat (F,), new_sflat (maxStats,), logits).

    ``pflat`` is the stage's packed weights — a loop CONSTANT of the tick
    scan; only the thin BN-stat slice ``sflat`` is carried tick to tick
    (running stats chain over a shard's microbatches). Carrying the full
    packed row instead (the obvious formulation) makes every tick write and
    checkpoint tens of MBs of unchanged weights — measured ~10 GB RSS and a
    14-minute step on the 8-virtual-device CPU mesh vs <1 GB / ~1 min with
    the stat-only carry; on a real slice the same bytes are per-tick HBM
    traffic.

    ``remat=True`` wraps the whole stage program in ``jax.checkpoint``: the
    tick scan's autodiff then saves only the stage INPUT buffer per tick (the
    activation GPipe must stash anyway) and recomputes the within-stage
    intermediates — conv/BN/relu activations of every unit in the stage — in
    the backward. This is the standard GPipe+remat composition: activation
    memory drops from O(ticks x stage_depth) intermediate tensors to
    O(ticks) boundary buffers, at ~one extra stage forward of FLOPs per tick.
    ``prevent_cse=False`` is safe (and recommended) under ``lax.scan``."""
    meta = spec.stage_metas[s]
    in_shape = spec.stage_in_shapes[s]
    mb = spec.microbatch
    in_n = mb * int(np.prod(in_shape))
    last = s == spec.num_stages - 1
    lo, hi = spec.stage_units[s]

    def branch(pflat, sflat, xflat):
        p = _unflatten(_splice_stats(spec, s, pflat, sflat), meta)
        x = xflat[:in_n].reshape((mb,) + in_shape)
        new = {}
        for i in range(lo, hi):
            x, ni = spec.units.apply(i, p, x, train)
            if train:
                new.update(ni)
        yf = jnp.ravel(x.astype(spec.dtype))
        if yf.size < spec.act_flat:
            yf = jnp.concatenate(
                [yf, jnp.zeros((spec.act_flat - yf.size,), spec.dtype)]
            )
        logits = (
            x.astype(spec.dtype)
            if last
            else jnp.zeros((mb, spec.num_classes), spec.dtype)
        )
        if train and spec.stage_stat_runs[s]:
            nf, _ = _flatten(new, spec.dtype)
            new_sflat = jax.lax.stop_gradient(_extract_stats(spec, s, nf))
        else:
            new_sflat = sflat
        return yf, new_sflat, logits

    if remat and train:  # no backward to feed in eval — checkpoint is a no-op
        return jax.checkpoint(branch, prevent_cse=False)
    return branch


def _masked_ce(logits, labels):
    """The shared masked CE (dtype-following: f32, or f64 under the x64
    equality tests) — one definition with the single-device train step."""
    from ..train.train_loop import masked_cross_entropy

    return masked_cross_entropy(logits, labels)


def _gpipe_schedule(spec: PipelineSpec, branches, pflat0, images, labels, train):
    """Run the full GPipe tick loop on this device (inside shard_map).

    images: (M, mb, H, W, 3) f32 (this data shard's microbatches, replicated
    over 'pipe'); labels: (M, mb) int32. Returns (final pflat with chained
    BN-stat updates, summed per-microbatch loss [nonzero on the last stage
    only], logits (M, mb, K) [nonzero on the last stage only])."""
    S, mb = spec.num_stages, spec.microbatch
    M = images.shape[0]
    assert images.shape[1] == mb, (images.shape, mb)
    T = M + S - 1
    sid = jax.lax.axis_index(PIPE_AXIS)
    perm = [(i, (i + 1) % S) for i in range(S)]
    img_n = mb * int(np.prod(spec.stage_in_shapes[0]))

    # The packed stage weights are a CONSTANT of the tick loop (SGD applies
    # after the schedule); only the BN-stat slice is carried. This keeps the
    # scan carry (and its autodiff residuals) at KBs instead of re-saving the
    # multi-MB packed row every tick.
    sflat0 = jax.lax.switch(
        sid,
        [
            functools.partial(_extract_stats, spec, s)
            for s in range(S)
        ],
        pflat0,
    )

    def tick(carry, t):
        sflat, buf, loss_acc, logits_acc = carry
        m = t - sid
        mc = jnp.clip(m, 0, M - 1)
        # stage 0 feeds microbatch t (clamped past the flush ticks)
        img = jax.lax.dynamic_index_in_dim(
            images, jnp.clip(t, 0, M - 1), 0, keepdims=False
        )
        img_flat = jnp.pad(
            jnp.ravel(img).astype(spec.dtype), (0, spec.act_flat - img_n)
        )
        x = jnp.where(sid == 0, img_flat, buf)
        y, new_sflat, logits = jax.lax.switch(sid, branches, pflat0, sflat, x)
        valid = (m >= 0) & (m < M)
        if train:  # chain BN-stat updates only on real (non-bubble) ticks
            sflat = jnp.where(valid, new_sflat, sflat)
        is_last_take = valid & (sid == S - 1)
        lab = jax.lax.dynamic_index_in_dim(labels, mc, 0, keepdims=False)
        mloss = _masked_ce(logits, lab)
        loss_acc = loss_acc + jnp.where(is_last_take, mloss, 0.0)
        prev = jax.lax.dynamic_index_in_dim(logits_acc, mc, 0, keepdims=False)
        logits_acc = jax.lax.dynamic_update_index_in_dim(
            logits_acc, jnp.where(is_last_take, logits, prev), mc, 0
        )
        buf = jax.lax.ppermute(y, PIPE_AXIS, perm)
        return (sflat, buf, loss_acc, logits_acc), None

    carry0 = (
        sflat0,
        jnp.zeros((spec.act_flat,), spec.dtype),
        jnp.zeros((), spec.dtype),
        jnp.zeros((M, mb, spec.num_classes), spec.dtype),
    )
    (sflatN, _, loss_acc, logits_acc), _ = jax.lax.scan(
        tick, carry0, jnp.arange(T)
    )
    # re-inject the chained stats into the packed row (params unchanged)
    pflatN = jax.lax.switch(
        sid,
        [_make_inject(spec, s) for s in range(S)],
        pflat0,
        sflatN,
    )
    return pflatN, loss_acc, logits_acc


def _make_inject(spec: PipelineSpec, s: int):
    def inject(pflat, sflat):
        spliced = _splice_stats(spec, s, pflat, sflat)
        return jnp.concatenate([spliced, pflat[spec.stage_sizes[s] :]])

    return inject


def pipeline_param_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(PIPE_AXIS, None))


def pipeline_batch_sharding(mesh: Mesh) -> NamedSharding:
    """(M, B, ...) microbatch stacks: batch dim sharded over 'data'."""
    return NamedSharding(mesh, P(None, DATA_AXIS))


def make_pipeline_eval_step(spec: PipelineSpec, mesh: Mesh):
    """jit fn(stacked (S, maxP), images (M, B, H, W, 3) f32) -> logits
    (M, B, K). Numerically identical to the single-device forward."""
    assert PIPE_AXIS in mesh.axis_names and DATA_AXIS in mesh.axis_names
    assert mesh.shape[PIPE_AXIS] == spec.num_stages
    branches = [_make_branch(spec, s, train=False) for s in range(spec.num_stages)]

    def body(stacked, images):
        pflat0 = stacked.reshape(-1)
        labels = jnp.zeros(images.shape[:2], jnp.int32)
        _, _, logits = _gpipe_schedule(spec, branches, pflat0, images, labels, False)
        # only the last stage wrote logits; psum broadcasts them over 'pipe'
        return jax.lax.psum(logits, PIPE_AXIS)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(PIPE_AXIS, None), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
        check_vma=False,
    )
    return jax.jit(fn)


def make_pipeline_train_step(
    spec: PipelineSpec,
    mesh: Mesh,
    lr: float,
    momentum: float = 0.9,
    remat: bool = False,
):
    """jit fn(stacked, mu, train_mask, stat_mask, images (M, B, H, W, 3) f32,
    labels (M, B) int32) -> (stacked', mu', loss).

    One global step = M microbatches per data shard through the S-stage
    pipeline: forward/backward via autodiff through the tick scan, gradient
    pmean over 'data', reference SGD(momentum) on the trainable leaves, BN
    running-stat chains merged (data-mean). ``mu`` is the flat momentum
    buffer (zeros_like(stacked) at init, matching torch/optax first-step
    semantics).

    ``remat=True`` checkpoints each stage program (see ``_make_branch``):
    the backward recomputes within-stage activations instead of stashing
    them per tick — the GPipe+remat composition that bounds activation HBM
    by the boundary buffers alone. Gradients are unchanged
    (tests/test_pipeline.py asserts f64 equality with the plain step)."""
    assert PIPE_AXIS in mesh.axis_names and DATA_AXIS in mesh.axis_names
    assert mesh.shape[PIPE_AXIS] == spec.num_stages
    branches = [
        _make_branch(spec, s, train=True, remat=remat)
        for s in range(spec.num_stages)
    ]

    def body(stacked, mu, train_mask, stat_mask, images, labels):
        pflat0 = stacked.reshape(-1)
        mu = mu.reshape(-1)
        tmask = train_mask.reshape(-1)
        smask = stat_mask.reshape(-1)
        M = images.shape[0]

        def loss_fn(pf):
            pflatN, loss_acc, _ = _gpipe_schedule(
                spec, branches, pf, images, labels, True
            )
            # differentiate the LOCAL loss (nonzero on the last stage only):
            # cotangents reach every stage through the ppermute-ring
            # transpose. A psum here would transpose to another psum under
            # check_vma=False and scale every gradient by S.
            return loss_acc / M, pflatN

        (loss, pflatN), g = jax.value_and_grad(loss_fn, has_aux=True)(pflat0)
        g = jax.lax.pmean(g, DATA_AXIS)
        loss = jax.lax.pmean(jax.lax.psum(loss, PIPE_AXIS), DATA_AXIS)
        pflatN = jax.lax.pmean(pflatN, DATA_AXIS)  # BN-stat chains: data-mean

        g = g * tmask
        mu_new = momentum * mu + g
        p_new = pflat0 - lr * mu_new * tmask
        p_new = smask * pflatN + (1.0 - smask) * p_new
        return p_new[None], mu_new[None], loss

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P(PIPE_AXIS, None),
            P(PIPE_AXIS, None),
            P(PIPE_AXIS, None),
            P(PIPE_AXIS, None),
            P(None, DATA_AXIS),
            P(None, DATA_AXIS),
        ),
        out_specs=(P(PIPE_AXIS, None), P(PIPE_AXIS, None), P()),
        check_vma=False,
    )
    return jax.jit(fn, donate_argnums=(0, 1))
