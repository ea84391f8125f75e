"""AOT-compiled serving artifacts (``jax.export`` / StableHLO).

TPU-native deployment counterpart of the reference's "ship a ``.pth`` plus
the model class" flow (``/root/reference/README.md`` usage +
``functions/functions_RESNET50_Truncate.py`` ``load_model``): the entire
fused serving program — uint8 ingest, optional YUV→RGB, normalise, forward,
softmax — together with the trained weights is serialised as ONE portable
StableHLO artifact. The serving host needs no model code, no checkpoint
file and no config: :func:`load_infer_artifact` returns a callable that XLA
compiles for whatever platform it lands on.

Why this is the TPU-first shape for deployment:

- the artifact is the *traced* program, so what was validated is exactly
  what serves — no Python-side drift, no dependency skew, no accidental
  retrace with different dtypes;
- the weights are embedded as StableHLO constants, so model + code version
  atomically (one file, one hash);
- a symbolic batch dimension (``batch_size=None``) exports one artifact
  valid for EVERY batch size — ``jax.export`` shape polymorphism; XLA
  specialises per concrete shape at call time and the persistent compile
  cache (core/cache.py) makes repeat loads cheap;
- multi-platform export (``platforms=("tpu", "cpu")``) lets one artifact be
  smoke-tested on a CPU host and served on TPU slices.

The int8 PTQ path exports too: the quantised encoder tree is closed over
like any other variables, so the artifact ships the int8 weights and the
fused requant program.
"""
from __future__ import annotations

import json
from typing import Callable, Optional, Sequence

import numpy as np

ARTIFACT_FORMAT = "hst-infer-artifact"
ARTIFACT_VERSION = 1


def _fused_infer(forward_eval: Callable, *, crop: int, transport: str,
                 compute_dtype=None) -> Callable:
    """The exact fused batch pipeline the serving batcher dispatches
    (tasks/serving.py): uint8 frames → probabilities, one program."""
    if transport == "yuv420":
        from ..tasks.camera import make_camera_infer_fn_yuv

        return make_camera_infer_fn_yuv(
            forward_eval, crop, compute_dtype=compute_dtype, batch=-1
        )
    if transport == "rgb":
        from ..tasks.camera import make_camera_infer_fn

        return make_camera_infer_fn(
            forward_eval, compute_dtype=compute_dtype, batch=-1,
            host_downscale=True,
        )
    raise ValueError("transport must be 'rgb' or 'yuv420'")


def _input_shape_tail(crop: int, transport: str) -> tuple:
    """Per-frame shape the artifact expects after the host-side prep that
    ``BatchingInferenceServer.submit`` performs (downscale to crop², then
    optional planar I420 packing)."""
    if transport == "yuv420":
        return (crop * 3 // 2, crop)
    return (crop, crop, 3)


def export_infer_artifact(
    forward_eval: Callable,
    variables,
    *,
    crop: int = 224,
    transport: str = "rgb",
    compute_dtype=None,
    batch_size: Optional[int] = None,
    platforms: Optional[Sequence[str]] = None,
    class_names: Optional[Sequence[str]] = None,
    extra_meta: Optional[dict] = None,
    mesh=None,
) -> tuple:
    """Trace + lower the fused serving program with ``variables`` baked in.

    Returns ``(blob, meta)``: the serialised ``jax.export.Exported`` bytes
    and the artifact metadata dict. ``batch_size=None`` exports a symbolic
    batch dimension (one artifact, any batch size); an int pins it.
    ``platforms=None`` lowers for the current default backend; pass e.g.
    ``("tpu", "cpu")`` for a cross-platform artifact.

    ``mesh``: a jax Mesh — the program is exported batch-sharded over the
    mesh's 'data' axis (SPMD with the collectives baked into the artifact);
    sharding is per-dimension metadata, so this requires a concrete
    ``batch_size``. Serving the artifact then needs exactly ``mesh.size``
    devices.
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    infer = _fused_infer(
        forward_eval, crop=crop, transport=transport, compute_dtype=compute_dtype
    )

    if mesh is not None:
        if batch_size is None:
            raise ValueError(
                "mesh-sharded export needs a concrete batch_size (a symbolic "
                "batch dimension cannot carry a sharding constraint)"
            )
        from ..parallel.sharding import batch_sharding

        sh = batch_sharding(mesh)
        serving_program = jax.jit(
            lambda batch_u8: infer(variables, batch_u8),
            in_shardings=sh, out_shardings=sh,
        )
    else:

        @jax.jit
        def serving_program(batch_u8):
            return infer(variables, batch_u8)

    tail = _input_shape_tail(crop, transport)
    if batch_size is None:
        (b,) = jexport.symbolic_shape("b")
    else:
        b = int(batch_size)
    spec = jax.ShapeDtypeStruct((b,) + tail, jnp.uint8)
    exp = jexport.export(
        serving_program,
        platforms=tuple(platforms) if platforms is not None else None,
    )(spec)
    meta = {
        "format": ARTIFACT_FORMAT,
        "version": ARTIFACT_VERSION,
        "crop": int(crop),
        "transport": transport,
        "batch_size": batch_size,
        "input_shape": ["b" if batch_size is None else int(batch_size), *tail],
        "num_outputs": int(np.prod(exp.out_avals[0].shape[1:])),
        "platforms": list(exp.platforms),
        "class_names": list(class_names) if class_names is not None else None,
        "compute_dtype": (
            jnp.dtype(compute_dtype).name if compute_dtype is not None else None
        ),
        "n_devices": int(exp.nr_devices),
        "jax_version": jax.__version__,
    }
    if extra_meta:
        meta.update(extra_meta)
    return exp.serialize(), meta


class InferenceArtifact:
    """A loaded serving artifact: ``artifact(batch_u8) -> probs``.

    ``batch_u8`` is ``(B, crop, crop, 3)`` RGB for the ``rgb`` transport or
    ``(B, crop*3//2, crop)`` planar I420 for ``yuv420`` — the same frames
    the batching server ships. The call is jitted, so each concrete batch
    shape compiles once (symbolic-batch artifacts accept any B).
    """

    def __init__(self, exported, meta: dict):
        import jax

        self.meta = dict(meta)
        self.exported = exported
        self._call = jax.jit(exported.call)

    def __call__(self, batch_u8):
        import jax

        need = int(self.exported.nr_devices)
        if need > len(jax.devices()):
            raise RuntimeError(
                f"artifact was exported SPMD over {need} devices but only "
                f"{len(jax.devices())} are visible"
            )
        return self._call(batch_u8)

    def server_infer_fn(self) -> Callable:
        """Adapter matching ``BatchingInferenceServer(infer_fn=...)``:
        ``fn(variables, batch) -> probs`` with variables ignored (they are
        constants inside the artifact). Routes through ``__call__`` so the
        nr_devices guard applies; for an SPMD artifact pass the batcher a
        ``mesh`` of ``exported.nr_devices`` devices so batches arrive
        sharded (cli/serve.py does this)."""
        return lambda _variables, batch_u8: self(batch_u8)


STYLE_ARTIFACT_FORMAT = "hst-style-artifact"


def export_style_artifact(
    service,
    *,
    platforms: Optional[Sequence[str]] = None,
    extra_meta: Optional[dict] = None,
) -> tuple:
    """Trace + lower a ``StyleTransferService``'s whole batched job program
    — uint8 ingest, target Grams (or the gallery stacks), the full
    Adam-on-pixels ``lax.while_loop`` with per-image early stop, and the
    uint8 denormalise — with the model weights AND the encoded style
    gallery baked in as StableHLO constants. The serving host then needs no
    model code, checkpoint or style images (:func:`load_style_artifact` +
    ``StyleTransferService(job_fn=...)``).

    The batch sizes, crop, iteration cap, threshold and learning rate are
    part of the traced programs (a while_loop's bound is static), so they
    ride the artifact, not the serving flags — ``meta`` records them all.

    A multi-size service exports its WHOLE dispatch ladder: one StableHLO
    program per compiled batch size (``meta["batch_sizes"]``), so serving
    from the artifact keeps the lone-job latency win of small-batch
    dispatch. Returns ``(blobs, meta)`` with ``blobs`` a
    ``{batch_size: bytes}`` mapping — write it with
    :func:`save_style_artifact`.
    """
    import jax
    from jax import export as jexport
    import jax.numpy as jnp

    c = service.crop
    k = max(1, len(service.style_names))
    blobs = {}
    platforms_out = n_devices = None
    for b in service.batch_sizes:
        specs = (
            jax.ShapeDtypeStruct((b, c, c, 3), jnp.uint8),
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b,), jnp.int32),
        )
        # the RAW (RGB) program: transport is a serve-time choice — a
        # yuv420-serving host exports the same RGB artifact, and any host
        # can serve an artifact with either transport (the service wraps
        # the deserialised program like any other job)
        exp = jexport.export(
            jax.jit(service._raw_jobs_by_size[b]),
            platforms=tuple(platforms) if platforms is not None else None,
        )(*specs)
        blobs[int(b)] = exp.serialize()
        platforms_out = list(exp.platforms)
        n_devices = int(exp.nr_devices)
    meta = {
        "format": STYLE_ARTIFACT_FORMAT,
        "version": ARTIFACT_VERSION,
        "crop": int(c),
        "batch_size": int(service.batch_size),
        "batch_sizes": [int(b) for b in service.batch_sizes],
        "num_iterations": int(service.num_iterations),
        "style_names": list(service.style_names),
        "platforms": platforms_out,
        "n_devices": n_devices,
        "jax_version": jax.__version__,
    }
    if extra_meta:
        meta.update(extra_meta)
    return blobs, meta


def _atomic_npz_write(path: str, **arrays) -> None:
    """Temp-file + rename npz write (like ``checkpoint.io.save_pytree_npz``)
    so a crash mid-export can never leave a torn artifact at ``path`` —
    shared by the infer- and style-artifact savers."""
    import os
    import tempfile

    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".hst.tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def save_style_artifact(path: str, blobs, meta: dict) -> None:
    """One self-contained file for the whole dispatch ladder: a
    ``stablehlo_<batch>`` entry per exported size + JSON metadata, written
    atomically like :func:`save_infer_artifact`. ``blobs`` may be a
    ``{batch_size: bytes}`` mapping or a single ``bytes`` (saved under the
    meta's ``batch_size``)."""
    if isinstance(blobs, (bytes, bytearray)):
        blobs = {int(meta["batch_size"]): bytes(blobs)}
    _atomic_npz_write(
        path,
        meta=np.asarray(json.dumps(meta)),
        **{
            f"stablehlo_{int(b)}": np.frombuffer(blob, dtype=np.uint8)
            for b, blob in blobs.items()
        },
    )


class StyleArtifact:
    """A loaded style-job artifact: ``artifact(images_u8, style_w,
    job_ids) -> (canvas_u8, iterations, per_image_loss)`` at an exported
    batch shape. ``job_fns`` maps each exported batch size to its program —
    pass it straight to ``StyleTransferService(job_fn=artifact.job_fns,
    style_names=artifact.meta["style_names"], crop=...)`` for dispatch-size
    selection parity with live serving; ``job_fn`` (the largest size's
    program) remains for single-size use."""

    def __init__(self, exported_by_size: dict, meta: dict):
        import jax

        self.meta = dict(meta)
        self.exported_by_size = dict(exported_by_size)
        self.job_fns = {
            int(b): jax.jit(e.call) for b, e in exported_by_size.items()
        }
        largest = max(self.job_fns)
        self.exported = self.exported_by_size[largest]
        self.job_fn = self.job_fns[largest]

    def __call__(self, images_u8, style_w, job_ids):
        return self.job_fns[int(images_u8.shape[0])](
            images_u8, style_w, job_ids
        )


def load_style_artifact(path: str) -> StyleArtifact:
    from jax import export as jexport

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("format") != STYLE_ARTIFACT_FORMAT:
            raise ValueError(f"{path} is not a {STYLE_ARTIFACT_FORMAT} file")
        if "stablehlo" in z.files:  # single-size artifact (format v1 files)
            blobs = {int(meta["batch_size"]): z["stablehlo"].tobytes()}
        else:
            blobs = {
                int(name.split("_")[-1]): z[name].tobytes()
                for name in z.files
                if name.startswith("stablehlo_")
            }
    return StyleArtifact(
        {b: jexport.deserialize(bytearray(blob)) for b, blob in blobs.items()},
        meta,
    )


def save_infer_artifact(path: str, blob: bytes, meta: dict) -> None:
    """One self-contained file: the StableHLO blob + JSON metadata (npz
    container — stdlib-loadable), written atomically
    (:func:`_atomic_npz_write`)."""
    _atomic_npz_write(
        path,
        stablehlo=np.frombuffer(blob, dtype=np.uint8),
        meta=np.asarray(json.dumps(meta)),
    )


def load_infer_artifact(path: str) -> InferenceArtifact:
    from jax import export as jexport

    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        if meta.get("format") != ARTIFACT_FORMAT:
            raise ValueError(f"{path} is not a {ARTIFACT_FORMAT} file")
        blob = z["stablehlo"].tobytes()
    return InferenceArtifact(jexport.deserialize(bytearray(blob)), meta)
