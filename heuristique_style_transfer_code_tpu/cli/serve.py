"""Serve a trained checkpoint over HTTP with dynamic batching.

TPU-native addition (the reference has only the single-stream camera loop,
functions/functions_RESNET50_Truncate.py:253-379): concurrent clients POST
images to /predict; the batcher packs them into one static-shape device
batch per dispatch.

    python -m heuristique_style_transfer_code_tpu.cli.serve \\
        --family truncated_resnet50 --config_path cfg.json \\
        --model_path models/best_global_model.npz --port 8000 \\
        --batch_size 64 --max_delay_ms 10 --precision bf16
"""
from __future__ import annotations

import argparse
import time

from ._common import (
    add_tpu_args,
    apply_debug_flags,
    cast_forward,
    count_params,
    load_checkpoint_tree,
    resolve_class_names,
    resolve_compute_dtype,
    resolve_eval_mesh,
    start_profile,
)

FAMILIES = ["truncated_resnet50", "gram_attention", "multi_patchgan"]


def build_parser():
    parser = argparse.ArgumentParser(
        description="HTTP inference server with dynamic batching"
    )
    parser.add_argument("--family", choices=FAMILIES, default="truncated_resnet50")
    parser.add_argument("--config_path", type=str,
                        help="Required unless --artifact is given")
    parser.add_argument("--model_path", type=str,
                        help="Required unless --artifact is given")
    parser.add_argument(
        "--artifact", type=str, default=None,
        help="Serve from an AOT artifact (deploy/artifact.py): the fused "
        "program + weights as one StableHLO file — no model code, config "
        "or checkpoint needed (transport/crop/classes come from its "
        "metadata; precision is baked in)",
    )
    parser.add_argument(
        "--export_artifact", type=str, default=None,
        help="Export the serving program (with the current --precision/"
        "--transport) to this path and exit instead of serving",
    )
    parser.add_argument(
        "--export_batch", type=str, default="any",
        help="Batch size baked into the exported artifact; 'any' (default) "
        "exports a symbolic batch dimension valid for every batch size",
    )
    parser.add_argument(
        "--export_platforms", type=str, default=None,
        help="Comma-separated lowering platforms for the artifact "
        "(e.g. 'tpu,cpu' for one artifact served on TPU and smoke-tested "
        "on CPU); default: the current backend",
    )
    parser.add_argument("--classes", nargs="+", type=str)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000,
                        help="0 picks a free port (printed at startup)")
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--max_delay_ms", type=float, default=10.0)
    parser.add_argument("--max_in_flight", type=int, default=3)
    parser.add_argument(
        "--transport", choices=["rgb", "yuv420"], default="rgb",
        help="Host->device frame format; yuv420 halves transfer bytes "
        "(measured 2.2x serving throughput behind a bandwidth-bound link)",
    )
    parser.add_argument(
        "--calib_data", type=str, default=None,
        help="ImageFolder root calibrating the int8 encoder — its train/ "
        "split when present, else test/ (required with --precision int8 "
        "unless --quantized_path points at an existing quantised tree)",
    )
    parser.add_argument(
        "--quantized_path", type=str, default=None,
        help="Persisted quantised-encoder npz: loaded if present (cold "
        "start skips calibration), else written after calibration",
    )
    parser.add_argument("--afficher_params", action="store_true")
    parser.add_argument("--max_seconds", type=float, default=None,
                        help="Exit after this many seconds (smoke tests)")
    parser.add_argument("--request_timeout", type=float, default=30.0,
                        help="Per-request wait on the batcher Future (s)")
    parser.add_argument("--no_warmup", action="store_true",
                        help="Skip the warm dispatch before binding the port "
                        "(first requests then pay the jit compile)")
    parser.add_argument(
        "--recycle_after_requests", type=int, default=0,
        help="Run the batcher in a spawned worker process and respawn it "
        "after this many requests (drain first — zero request failures "
        "across the handover; respawns warm-start from the persistent "
        "compile cache). Bounds host RSS behind the leaking axon relay "
        "(~4.6 MB per device_put, tasks/recycling.py); unnecessary on "
        "directly-attached TPUs",
    )
    add_tpu_args(parser, precisions=("float32", "bf16", "int8"))
    return parser


def _build_forward(family: str, config_path: str, model_path: str):
    """Returns (forward_eval, variables, config_dict)."""
    if family == "truncated_resnet50":
        from ..config.schema import TruncatedResNetConfig
        from ..models.truncated_resnet50 import combined_apply

        cfg = TruncatedResNetConfig.from_json(config_path)
        variables = load_checkpoint_tree(model_path, family, cfg.to_dict())
        # moco-only checkpoints (e.g. pretrain-phase .pth converted by
        # convert_moco_checkpoint) have no classifier head — fail here with
        # a clear message instead of a bare KeyError during jit tracing
        # (same guard as cli/test_truncated_resnet50.py:124-128)
        if "moco" not in variables or "classifier" not in variables:
            raise KeyError(
                f"Checkpoint {model_path} does not contain the family-1 "
                "{'moco', 'classifier'} tree — classifier weights not "
                "found in checkpoint."
            )
        t = cfg.truncate_layer

        def forward_eval(v, images):
            logits, _ = combined_apply(v["moco"], v["classifier"], images, t)
            return logits

        return forward_eval, variables, cfg.to_dict()
    if family == "gram_attention":
        from ..config.schema import GramAttentionConfig
        from ..models.gram_attention import gram_attention_apply

        cfg = GramAttentionConfig.from_json(config_path)
        config = cfg.to_dict()
        num_classes = int(config.get("num_classes", 4))
        t, s = cfg.truncate_layer, cfg.gram_matrix_size
        variables = load_checkpoint_tree(model_path, family, config)

        def forward_eval(v, images):
            _, logits, _ = gram_attention_apply(
                v, images, t, s, num_classes, train=False
            )
            return logits

        return forward_eval, variables, config
    # multi_patchgan
    from ..config.schema import MultiPatchGANConfig
    from ..models.multi_patchgan import multiscale_apply

    cfg = MultiPatchGANConfig.from_json(config_path)
    config = cfg.to_dict()
    variables = load_checkpoint_tree(model_path, family, config)
    norm = cfg.norm

    def forward_eval(v, images):
        logits, _ = multiscale_apply(v, images, norm=norm, train=False)
        return logits

    return forward_eval, variables, config


def _resolve_forward(args):
    """(forward_eval, variables, config, class_names) with the precision
    path (bf16 cast / int8 PTQ) already applied — shared by the serving and
    artifact-export flows so the exported program IS the served program."""
    if not args.config_path or not args.model_path:
        raise ValueError("--config_path and --model_path are required "
                         "unless --artifact is given")
    forward_eval, variables, config = _build_forward(
        args.family, args.config_path, args.model_path
    )
    class_names = resolve_class_names(args.classes, config, None)
    if args.afficher_params:
        print(f"Nombre total de paramètres du modèle : {count_params(variables)}")
    if args.precision == "int8":
        if args.family not in ("truncated_resnet50", "gram_attention"):
            raise ValueError("--precision int8 is served for the "
                             "truncated_resnet50 and gram_attention families")
        import os as _os

        from ._common import (
            build_int8_family1,
            collect_calibration_batches,
            make_calibration_loader,
        )

        cal = None
        if not (args.quantized_path and _os.path.exists(args.quantized_path)):
            if not args.calib_data:
                raise ValueError(
                    "--precision int8 requires --calib_data "
                    "(or an existing --quantized_path)"
                )
            cal = collect_calibration_batches(
                make_calibration_loader(args, args.batch_size)
            )
        truncate = int(config.get("truncate_layer", 8))
        if args.family == "gram_attention":
            from ._common import build_int8_family2

            apply_eval, variables = build_int8_family2(
                variables, truncate,
                int(config.get("gram_matrix_size", 7)),
                int(config.get("num_classes", 4)),
                cal, quantized_path=args.quantized_path,
            )

            def forward_eval(v, images):  # noqa: F811
                return apply_eval(v, images)[1]

        else:
            forward_eval, _, variables = build_int8_family1(  # noqa: F811
                variables, truncate, cal, quantized_path=args.quantized_path
            )
    else:
        forward_eval = cast_forward(
            forward_eval, resolve_compute_dtype(args.precision)
        )
    return forward_eval, variables, config, class_names


def export_artifact(args) -> None:
    """--export_artifact flow: trace+lower the exact serving program (same
    precision/transport knobs as `start`) and write one deployable file."""
    from ..deploy import export_infer_artifact, save_infer_artifact

    forward_eval, variables, config, class_names = _resolve_forward(args)
    batch = None if args.export_batch == "any" else int(args.export_batch)
    platforms = (
        [p.strip() for p in args.export_platforms.split(",") if p.strip()]
        if args.export_platforms else None
    )
    mesh = None
    if args.devices and args.devices > 1:
        if batch is None:
            raise ValueError("--devices with --export_artifact needs a "
                             "concrete --export_batch (sharded SPMD export "
                             "cannot use a symbolic batch)")
        if batch % args.devices:
            # never silently seal a smaller mesh than asked for — the
            # artifact would then REQUIRE that clamped device count forever
            raise ValueError(
                f"--export_batch {batch} is not divisible by --devices "
                f"{args.devices}; pick a dividing batch (the device count "
                "is sealed into the artifact)"
            )
        mesh = resolve_eval_mesh(args.devices, batch)
        got = mesh.size if mesh is not None else 1
        if got != args.devices:
            import jax

            # resolve_eval_mesh clamps to the VISIBLE device count — an
            # export host smaller than the target slice would otherwise
            # silently seal the clamped mesh into the artifact forever
            raise ValueError(
                f"--devices {args.devices} requested but only a {got}-device "
                f"mesh could be built here ({len(jax.devices())} visible); "
                "export on a host that sees the target device count"
            )
    blob, meta = export_infer_artifact(
        forward_eval, variables,
        transport=args.transport, batch_size=batch, platforms=platforms,
        class_names=class_names, mesh=mesh,
        extra_meta={"family": args.family, "precision": args.precision},
    )
    save_infer_artifact(args.export_artifact, blob, meta)
    print(f"Artifact exported to {args.export_artifact} "
          f"(platforms {meta['platforms']}, batch "
          f"{'symbolic' if batch is None else batch}, "
          f"{len(blob) / 1e6:.1f} MB)")


def _build_batcher(args):
    """Build, start and (unless --no_warmup) warm the batcher: everything
    device-side, shared by ``start`` (in-process serving) and
    ``_recycle_worker`` (the spawned worker of --recycle_after_requests).
    Returns (batcher, class_names, batch_size, served_desc)."""
    from ..tasks.serving import BatchingInferenceServer

    if args.artifact:
        from ..deploy import load_infer_artifact

        art = load_infer_artifact(args.artifact)
        meta = art.meta
        if meta["batch_size"] is not None and meta["batch_size"] != args.batch_size:
            print(f"Note: artifact pins batch_size={meta['batch_size']} "
                  f"(overriding --batch_size {args.batch_size})")
        batch_size = meta["batch_size"] or args.batch_size
        if meta["transport"] != args.transport:
            print(f"Note: artifact transport is '{meta['transport']}' "
                  f"(overriding --transport {args.transport})")
        class_names = resolve_class_names(
            args.classes, {"classes": meta["class_names"]}
            if meta.get("class_names") else {}, None,
        )
        # a mesh-sharded artifact seals its device count: rebuild a mesh of
        # that size so the batcher ships batch-sharded inputs (the sealed
        # program is SPMD — feeding it single-device batches cannot work)
        n_dev = int(art.exported.nr_devices)
        mesh = None
        if n_dev > 1:
            import jax

            from ..core.mesh import create_mesh

            if len(jax.devices()) < n_dev:
                raise SystemExit(
                    f"artifact was exported SPMD over {n_dev} devices but "
                    f"only {len(jax.devices())} are visible"
                )
            mesh = create_mesh(n_dev)
            if args.devices and args.devices != n_dev:
                print(f"Note: artifact seals its sharding over {n_dev} "
                      f"devices (--devices {args.devices} ignored)")
        elif args.devices:
            print("Note: --devices is ignored with an unsharded --artifact "
                  "(the program is sealed; shard at export time: "
                  "--export_artifact with --devices N --export_batch B)")
        start_profile(args.profile_dir)
        batcher = BatchingInferenceServer(
            None, None,
            batch_size=batch_size,
            max_delay_ms=args.max_delay_ms,
            max_in_flight=args.max_in_flight,
            transport=meta["transport"],
            crop=meta["crop"],
            mesh=mesh,
            infer_fn=art.server_infer_fn(),
        ).start()
    else:
        forward_eval, variables, config, class_names = _resolve_forward(args)
        batch_size = args.batch_size
        start_profile(args.profile_dir)

        batcher = BatchingInferenceServer(
            forward_eval,
            variables,
            batch_size=args.batch_size,
            max_delay_ms=args.max_delay_ms,
            max_in_flight=args.max_in_flight,
            transport=args.transport,
            mesh=resolve_eval_mesh(args.devices, args.batch_size),
        ).start()
    if not args.no_warmup:
        # pay the jit compile (minutes on a remote-compile backend) BEFORE
        # the port opens, so no live request ever times out on it
        import numpy as _np

        print("Warming up (first jit compile)...", flush=True)
        t0 = time.time()
        warm = _np.zeros((batcher.crop, batcher.crop, 3), dtype=_np.uint8)
        warm[::2, ::2] = 128  # non-constant: compressible-transport-proof
        batcher.submit(warm).result()
        print(f"Warmup done in {time.time() - t0:.1f}s")
    served = (
        f"artifact {args.artifact} [{art.meta.get('family', 'unknown')}]"
        if args.artifact else args.family
    )
    return batcher, class_names, batch_size, served


def _recycle_worker(argv):
    """Builder run INSIDE the recycling worker child (tasks/recycling.py):
    reconstructs the exact configured batcher from the serve argv."""
    args = build_parser().parse_args(argv)
    apply_debug_flags(args)
    batcher, class_names, batch_size, served = _build_batcher(args)
    info = {
        "crop": batcher.crop,
        "transport": batcher.transport,
        "class_names": class_names,
        "batch_size": batch_size,
        "served": served,
        "count_key": "images",
        "max_queue": batcher.max_queue,
    }
    return batcher, info


def _recycle_preprocess(info):
    """Parent-side submit preprocessing for the recycling proxy: the same
    validation + host downscale ``BatchingInferenceServer.submit`` runs, in
    the HTTP request thread (bad frames still 400 synchronously, and the
    downscale cost spreads over client threads)."""
    crop = int(info["crop"])

    def prep(frame):
        from ..tasks.serving import prepare_frame

        return (prepare_frame(frame, crop),), {}

    return prep


def start_recycling(args, argv):
    """--recycle_after_requests flow: the batcher lives in a spawned worker
    process (respawned after N requests, drained first); this parent keeps
    only the HTTP server and never touches the accelerator. Returns
    (srv, proxy) with the same surface as ``start``."""
    from ..tasks.recycling import RecyclingServiceProxy, strip_flag
    from ..tasks.serving_http import make_http_server

    proxy = RecyclingServiceProxy(
        "heuristique_style_transfer_code_tpu.cli.serve:_recycle_worker",
        strip_flag(list(argv), "--recycle_after_requests"),
        recycle_after=args.recycle_after_requests,
        preprocess_factory=_recycle_preprocess,
    ).start()
    srv = make_http_server(
        proxy, proxy.info["class_names"], args.host, args.port,
        timeout_s=args.request_timeout,
    )
    import threading

    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    print(f"Serving {proxy.info['served']} on http://{host}:{port} "
          f"(batch {proxy.info['batch_size']}, deadline {args.max_delay_ms} "
          f"ms, worker recycled every {args.recycle_after_requests} requests)")
    return srv, proxy


def start(args):
    """Build the batcher + HTTP server and start both (returns (srv, batcher);
    used by main() and callable programmatically/from tests)."""
    from ..tasks.serving_http import make_http_server

    batcher, class_names, batch_size, served = _build_batcher(args)
    srv = make_http_server(
        batcher, class_names, args.host, args.port,
        timeout_s=args.request_timeout,
    )
    import threading

    threading.Thread(target=srv.serve_forever, daemon=True).start()
    host, port = srv.server_address
    print(f"Serving {served} on http://{host}:{port} "
          f"(batch {batch_size}, deadline {args.max_delay_ms} ms)")
    return srv, batcher


def main(argv=None):
    import sys

    raw_argv = list(sys.argv[1:] if argv is None else argv)
    args = build_parser().parse_args(raw_argv)
    apply_debug_flags(args)
    if args.export_artifact:
        if args.artifact:
            raise ValueError("--export_artifact and --artifact are exclusive")
        export_artifact(args)
        return
    if args.artifact and args.precision != "float32":
        raise ValueError("--precision is baked into the artifact at export "
                         "time; do not pass it with --artifact")
    # SIGTERM = orchestrated shutdown (systemd/k8s): stop accepting, drain
    # everything already submitted, then exit — same path as Ctrl-C.
    # Registered BEFORE the (slow) warmup so a signal landing mid-compile
    # still shuts down cleanly instead of killing the process.
    import signal

    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread (programmatic use)
    if args.recycle_after_requests:
        srv, batcher = start_recycling(args, raw_argv)
    else:
        srv, batcher = start(args)
    try:
        t0 = time.time()
        while args.max_seconds is None or time.time() - t0 < args.max_seconds:
            if stop_requested["flag"]:
                print("SIGTERM: draining and shutting down")
                break
            time.sleep(0.2)
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        batcher.stop(drain=True)
        stats = batcher.stats()
        print(f"Stats: {stats['images']} images in {stats['batches']} batches "
              f"(mean occupancy {stats['mean_batch_occupancy']:.2f})")


if __name__ == "__main__":
    main()
