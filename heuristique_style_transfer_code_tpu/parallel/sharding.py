"""Multi-chip sharding: 2-D (data x model) mesh over ICI.

The workload is convolutional classification, so the scaling strategy is
data parallelism (batch sharded over 'data'; XLA inserts the gradient
all-reduce) with tensor parallelism on the dense projection heads (the MoCo
fc and classifier kernels sharded over 'model') — the only layers with
enough width to be worth splitting. The reference has no distributed path
at all (SURVEY.md §2.4); this module is the TPU-native replacement.

Rules are path-based so they apply to any of the three families' trees.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def _axis_factor(n: int) -> int:
    """Default non-data axis size: a factor of 2 when the (remaining) device
    count allows it — enough parallelism to exercise the axis's collectives
    without starving DP — else 1. The single factorisation policy shared by
    every mesh factory here."""
    return 2 if n % 2 == 0 and n >= 2 else 1


def make_mesh_2d(n_devices: Optional[int] = None, model_parallel: Optional[int] = None) -> Mesh:
    """(data, model) mesh. model axis defaults to 2 when the device count is
    even (enough TP to exercise collectives without starving DP), else 1."""
    devices = jax.devices()
    n = min(n_devices or len(devices), len(devices))
    if model_parallel is None:
        model_parallel = _axis_factor(n)
    assert n % model_parallel == 0
    grid = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


# one dotted-path rendering for the whole codebase: endswith/startswith
# rules here must agree with train/optim.label_tree's masks on the same tree
from ..train.optim import _path_str  # noqa: E402


def variable_shardings(variables, mesh: Mesh):
    """Sharding tree: dense head kernels column-sharded over 'model'
    (their biases likewise); everything else (convs, BN, attention)
    replicated — conv kernels are small relative to activations here, and
    replication keeps them out of the collective path."""

    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        if not hasattr(leaf, "shape"):
            return NamedSharding(mesh, P())
        p = _path_str(path)
        is_head = (
            p.endswith("fc.kernel")
            or p.endswith("classifier.kernel")
            or p.endswith("feature_projection.kernel")
        )
        if is_head and leaf.ndim == 2 and leaf.shape[1] % model_size == 0:
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if is_head:
            return NamedSharding(mesh, P())
        if (
            (p.endswith("fc.bias") or p.endswith("feature_projection.bias"))
            and leaf.ndim == 1
            and leaf.shape[0] % model_size == 0
        ):
            return NamedSharding(mesh, P(MODEL_AXIS))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, variables)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


SPATIAL_AXIS = "spatial"


def make_mesh_3d(n_devices: Optional[int] = None) -> Mesh:
    """(data, model, spatial) mesh: model and spatial each take a factor of 2
    when available (enough to exercise the TP collectives and the conv halo
    exchanges without starving DP); axes degrade to size 1 otherwise."""
    devices = jax.devices()
    n = min(n_devices or len(devices), len(devices))
    spatial = _axis_factor(n)
    model = _axis_factor(n // spatial)
    data = n // (spatial * model)
    grid = np.asarray(devices[:n]).reshape(data, model, spatial)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS, SPATIAL_AXIS))


def image_sharding(mesh: Mesh) -> NamedSharding:
    """Batch images: N over 'data', and — when the mesh has a 'spatial' axis —
    H over 'spatial' (GSPMD inserts the conv halo exchanges)."""
    if SPATIAL_AXIS in mesh.axis_names:
        return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def make_mesh_spatial(
    n_devices: Optional[int] = None, spatial: Optional[int] = None
) -> Mesh:
    """(data, spatial) mesh for spatially-partitioned conv inference: the
    batch is sharded over 'data' and each image's H axis over 'spatial'.
    XLA/GSPMD inserts the conv halo exchanges automatically, so this scales
    single-image latency for large inputs — the TPU-native alternative to
    the reference's single-GPU big-image path. ``spatial`` defaults to 2 on
    even device counts."""
    devices = jax.devices()
    n = min(n_devices or len(devices), len(devices))
    if spatial is None:
        spatial = _axis_factor(n)
    assert n % spatial == 0
    grid = np.asarray(devices[:n]).reshape(n // spatial, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def make_spatial_eval_step(forward_eval, mesh: Mesh, crop: int = 224):
    """jit ``forward_eval(variables, images)`` with images sharded
    (N over 'data', H over 'spatial'), variables replicated, logits sharded
    over 'data'. Numerically identical to single-device (halo exchange is a
    layout concern); uint8 input is preprocessed on-device like the
    single-device eval step."""
    from ..data.augment import eval_preprocess

    def step(variables, images_u8):
        return forward_eval(variables, eval_preprocess(images_u8, crop))

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step,
        in_shardings=(repl, image_sharding(mesh)),
        out_shardings=NamedSharding(mesh, P(DATA_AXIS)),
    )


def _zero1_leaf_spec(leaf, data_size: int) -> P:
    """Shard the leaf's largest data_size-divisible dim over 'data'; tiny or
    indivisible leaves stay replicated (they are KBs — biases, BN scales)."""
    if not hasattr(leaf, "shape") or leaf.ndim == 0:
        return P()
    for i in sorted(range(leaf.ndim), key=lambda j: -leaf.shape[j]):
        if leaf.shape[i] >= data_size and leaf.shape[i] % data_size == 0:
            spec = [None] * leaf.ndim
            spec[i] = DATA_AXIS
            return P(*spec)
    return P()


def zero1_state_shardings(opt_state, mesh: Mesh):
    """ZeRO-1 layout for the optimiser state: every state leaf (the SGD
    momentum / Adam moment trees) sharded 1/D over 'data', so each device
    stores only its shard. Leaves with no data_size-divisible dim are
    replicated — for the flagship that replicates <1% of the state bytes."""
    d = mesh.shape[DATA_AXIS]
    return jax.tree_util.tree_map(
        lambda l: NamedSharding(mesh, _zero1_leaf_spec(l, d)), opt_state
    )


def make_zero1_train_step(
    forward_train, optimizer, augment_fn, mesh: Mesh, variables, opt_state
):
    """Data-parallel train step with ZeRO-1 optimiser-state sharding.

    Identical computation to ``make_sharded_train_step`` (the reference's
    SGD semantics, train_best_RESNET50_Truncate.py:191-194), but the
    optimiser state lives sharded 1/D over the 'data' axis instead of
    replicated: GSPMD turns the gradient all-reduce into a reduce-scatter
    into each device's momentum shard and an all-gather of the updated
    parameters — the classic ZeRO-1 schedule, expressed purely as sharding
    annotations on the SAME jitted step. Per-device optimiser memory drops
    from O(P) to O(P/D) (the flagship's 25.5M-param momentum: 102 MB -> 13 MB
    per device at D=8).

    Returns (jitted step, optimizer-state sharding tree). The caller places
    the initial state with ``jax.device_put(opt_state, o_shard)``.
    """
    from ..train.train_loop import make_train_step_body

    step = make_train_step_body(forward_train, optimizer, augment_fn)
    if MODEL_AXIS in mesh.axis_names:
        v_shard = variable_shardings(variables, mesh)
    else:
        v_shard = jax.tree_util.tree_map(
            lambda _: NamedSharding(mesh, P()), variables
        )
    o_shard = zero1_state_shardings(opt_state, mesh)
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    return (
        jax.jit(
            step,
            in_shardings=(v_shard, o_shard, image_sharding(mesh), data, data, repl),
            out_shardings=(v_shard, o_shard, repl),
            donate_argnums=(0, 1),
        ),
        o_shard,
    )


def fsdp_variable_shardings(variables, mesh: Mesh):
    """FSDP/ZeRO-3 layout for the parameters themselves: every leaf stored
    1/D over 'data' (largest divisible dim), tiny/indivisible leaves
    replicated — the SAME per-leaf policy as the optimiser state, so the
    two layouts can never drift apart."""
    return zero1_state_shardings(variables, mesh)


def make_fsdp_train_step(
    forward_train, optimizer, augment_fn, mesh: Mesh, variables, opt_state
):
    """Fully-sharded data parallelism (ZeRO-3): parameters AND optimiser
    state stored 1/D over 'data'. XLA all-gathers each weight at its use
    sites (forward and backward) and reduce-scatters the gradients straight
    into the sharded update — per-device parameter + momentum memory drops
    to O(P/D), paid for with per-step all-gather traffic over ICI. Same
    computation, same numerics, pure sharding annotations on the shared
    step body (the TPU-native expression of FSDP — no wrapper modules, no
    hand-written gather/scatter).

    Returns (jitted step, variable sharding tree, optimizer-state sharding
    tree); place initial trees with ``jax.device_put`` (or let jit reshard
    on first call)."""
    from ..train.train_loop import make_train_step_body

    step = make_train_step_body(forward_train, optimizer, augment_fn)
    v_shard = fsdp_variable_shardings(variables, mesh)
    o_shard = zero1_state_shardings(opt_state, mesh)
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)
    return (
        jax.jit(
            step,
            in_shardings=(v_shard, o_shard, image_sharding(mesh), data, data, repl),
            out_shardings=(v_shard, o_shard, repl),
            donate_argnums=(0, 1),
        ),
        v_shard,
        o_shard,
    )


def make_sharded_train_step(forward_train, optimizer, augment_fn, mesh: Mesh, variables):
    """Full training step jitted over the mesh: on-device augmentation ->
    forward -> CE -> grads -> SGD -> BN-stat merge, with the batch sharded
    over 'data', parameters laid out per ``variable_shardings``, and — on a
    3-D (data x model x spatial) mesh — each image's H axis sharded over
    'spatial'. XLA inserts the grad all-reduce (data), the head matmul
    collectives (model), and the conv halo exchanges (spatial) over ICI."""
    from ..train.train_loop import make_train_step_body

    v_shard = variable_shardings(variables, mesh)
    repl = NamedSharding(mesh, P())
    data = batch_sharding(mesh)

    step = make_train_step_body(forward_train, optimizer, augment_fn)

    # opt-state sharding mirrors the variables' (momentum per leaf); jit
    # infers it from the input layout (in_shardings=None passes through)
    return jax.jit(
        step,
        in_shardings=(v_shard, None, image_sharding(mesh), data, data, repl),
        out_shardings=(v_shard, None, repl),
        donate_argnums=(0, 1),
    ), v_shard
