"""Serve the namesake style transfer over HTTP with job batching.

TPU-native addition (the reference runs style transfer as an offline
per-image script, functions/functions_RESNET50_Truncate_Gram_Attention.py:
218-285): clients POST images to /style; the service packs concurrent jobs
into one batched Adam-on-pixels ``lax.while_loop`` per dispatch with
per-image early stop, and answers each with the stylised PNG.

    python -m heuristique_style_transfer_code_tpu.cli.serve_style \\
        --family gram_attention --config_path cfg.json \\
        --model_path models/best_global_model.npz --port 8001 \\
        --batch_size 8 --num_iterations 500 --precision bf16
"""
from __future__ import annotations

import argparse
import time

from ._common import (
    add_tpu_args,
    apply_debug_flags,
    count_params,
    load_checkpoint_tree,
    resolve_compute_dtype,
    resolve_eval_mesh,
    start_profile,
)

FAMILIES = ["gram_attention", "multi_patchgan"]


def build_parser():
    parser = argparse.ArgumentParser(
        description="HTTP style-transfer job server with dynamic batching"
    )
    parser.add_argument("--family", choices=FAMILIES, default="gram_attention")
    parser.add_argument("--config_path", type=str, default=None,
                        help="Required unless --artifact is given")
    parser.add_argument("--model_path", type=str, default=None,
                        help="Required unless --artifact is given")
    parser.add_argument(
        "--artifact", type=str, default=None,
        help="Serve from an AOT style artifact (deploy/artifact.py): the "
        "whole batched while_loop job program with weights and the style "
        "gallery baked in — no model code, checkpoint or style images on "
        "the serving host. Batch size / crop / iterations / gallery come "
        "from the artifact metadata (those flags are ignored).",
    )
    parser.add_argument(
        "--export_artifact", type=str, default=None,
        help="Write the AOT style artifact for the configured service to "
        "this path and exit (serve it later with --artifact)",
    )
    parser.add_argument(
        "--export_platforms", type=str, default=None,
        help="Comma-separated lowering platforms for --export_artifact "
        "(e.g. 'tpu,cpu'); default: the current backend",
    )
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8001,
                        help="0 picks a free port (printed at startup)")
    parser.add_argument("--batch_size", type=str, default="8",
                        help="Jobs per batched while_loop dispatch. A "
                        "comma list ('8,64') compiles several sizes and "
                        "each dispatch uses the smallest that fits the "
                        "queued jobs — light load answers at small-batch "
                        "latency, full load at big-batch throughput")
    parser.add_argument(
        "--transport", choices=["rgb", "yuv420"], default="rgb",
        help="Device wire format for job pixels. 'yuv420' ships planar "
        "I420 uint8 BOTH ways (input + the stylised result) — half the "
        "bytes through a bandwidth-bound link, standard 4:2:0 chroma "
        "subsampling (lossy, opt-in; the HTTP surface stays RGB/PNG)")
    parser.add_argument("--max_delay_ms", type=float, default=200.0,
                        help="Flush deadline for a partially filled batch "
                        "(style jobs run for seconds — waiting to double "
                        "occupancy is almost always the right trade)")
    parser.add_argument("--max_in_flight", type=int, default=2)
    parser.add_argument("--num_iterations", type=int, default=500)
    parser.add_argument("--threshold", type=float, default=1e-4)
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument(
        "--layers", type=int, default=None,
        help="Family-2 encoder truncation, exactly the reference's "
        "Sequential slice (rejected for multi_patchgan: broken upstream)",
    )
    parser.add_argument(
        "--style_image", action="append", default=None, metavar="NAME=PATH",
        help="Content+style mode (family gram_attention only): add a named "
        "style image to the gallery (repeatable; a bare PATH names the "
        "style after the file stem). The gallery is encoded once at "
        "startup; clients pick a style per request with the X-Style header "
        "(GET /styles lists names). Without this flag the server runs the "
        "reference's texture-from-self loop.",
    )
    parser.add_argument("--style_weight", type=float, default=1.0)
    parser.add_argument("--content_weight", type=float, default=1.0)
    parser.add_argument("--tv_weight", type=float, default=0.0)
    parser.add_argument(
        "--style_init", choices=["content", "noise"], default="content",
        help="Canvas initialisation for --style_image jobs",
    )
    parser.add_argument(
        "--style_layers", choices=["last", "all"], default="last",
        help="Style Grams at the truncation point only, or at every "
        "executed ResNet stage (classic multi-scale Gatys statistics)",
    )
    parser.add_argument(
        "--net", type=str, default=None,
        help="Serve a trained feed-forward style network "
        "(hst-train-style-net's style_net.npz) instead of the iterative "
        "loop: each job is ONE forward pass — milliseconds, not seconds. "
        "--config_path/--model_path and the loop knobs are ignored; crop "
        "and the style name come from the net's hyperparameters file.",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="Checkpoint encoder bottlenecks inside the job while_loop "
        "(family gram_attention): smaller per-iteration activation "
        "footprint -> bigger batch x canvas per chip",
    )
    parser.add_argument("--afficher_params", action="store_true")
    parser.add_argument("--max_seconds", type=float, default=None,
                        help="Exit after this many seconds (smoke tests)")
    parser.add_argument("--request_timeout", type=float, default=300.0,
                        help="Per-request wait on the job Future (s)")
    parser.add_argument("--no_warmup", action="store_true",
                        help="Skip the AOT compile before binding the port")
    parser.add_argument(
        "--recycle_after_requests", type=int, default=0,
        help="Run the job service in a spawned worker process and respawn "
        "it after this many requests (drain first — zero request failures "
        "across the handover; respawns warm-start from the persistent "
        "compile cache). Bounds host RSS behind the leaking axon relay "
        "(~4.6 MB per device_put, tasks/recycling.py); unnecessary on "
        "directly-attached TPUs",
    )
    add_tpu_args(parser, precisions=("float32", "bf16"))
    return parser


def _sizes_gcd(sizes):
    """Mesh-safe data-axis width for a multi-size dispatch ladder: the mesh
    must divide EVERY compiled batch size (a dispatch at any ladder size
    device_puts with the same batch sharding), so the usable device count
    is bounded by the gcd of the sizes — min(sizes) alone would let e.g.
    --batch_size 6,8 --devices 3 serve lone jobs fine and fail every
    full-batch dispatch."""
    import math

    g = 0
    for s in sizes:
        g = math.gcd(g, int(s))
    return max(1, g)


def _build_gram_fn(args):
    """(gram_fn, crop) for the selected family, precision applied."""
    dtype = resolve_compute_dtype(args.precision)
    if args.family == "gram_attention":
        from ..config.schema import GramAttentionConfig
        from ..tasks.style_transfer import make_gram_fn_gram_attention

        cfg = GramAttentionConfig.from_json(args.config_path)
        variables = load_checkpoint_tree(
            args.model_path, "gram_attention", cfg.to_dict()
        )
        if args.afficher_params:
            print(
                f"Nombre total de paramètres du modèle : {count_params(variables)}"
            )
        return make_gram_fn_gram_attention(
            variables, cfg.truncate_layer, layers=args.layers,
            compute_dtype=dtype, remat=args.remat,
        )
    from ..config.schema import MultiPatchGANConfig
    from ..tasks.style_transfer import make_gram_fn_patches

    if args.layers is not None:
        raise ValueError(
            "The reference's --layers truncation for PatchGAN style transfer "
            "is non-functional upstream (functions_Multi_PatchGAN.py:242); "
            "run without --layers."
        )
    cfg = MultiPatchGANConfig.from_json(args.config_path)
    variables = load_checkpoint_tree(
        args.model_path, "multi_patchgan", cfg.to_dict()
    )
    if args.afficher_params:
        print(
            f"Nombre total de paramètres du modèle : {count_params(variables)}"
        )
    return make_gram_fn_patches(
        variables, cfg.gram_matrix_dim, norm=cfg.norm, compute_dtype=dtype
    )


def _build_content_style_kwargs(args):
    """Service kwargs for --style_image mode: the family-2 feature program
    plus the named style gallery."""
    import os

    if args.family != "gram_attention":
        raise ValueError("--style_image requires --family gram_attention")
    from ..config.schema import GramAttentionConfig
    from ..data.loader import load_image_staged
    from ..tasks.style_transfer import make_extract_fn_gram_attention

    cfg = GramAttentionConfig.from_json(args.config_path)
    variables = load_checkpoint_tree(
        args.model_path, "gram_attention", cfg.to_dict()
    )
    if args.afficher_params:
        print(
            f"Nombre total de paramètres du modèle : {count_params(variables)}"
        )
    extract_fn = make_extract_fn_gram_attention(
        variables, cfg.truncate_layer, layers=args.layers,
        compute_dtype=resolve_compute_dtype(args.precision),
        style_layers=args.style_layers, remat=args.remat,
    )
    styles = {}
    for spec in args.style_image:
        name, sep, path = spec.partition("=")
        if not sep:
            name, path = os.path.splitext(os.path.basename(spec))[0], spec
        if name in styles:
            raise ValueError(f"duplicate style name {name!r}")
        styles[name] = load_image_staged(path)
    return dict(
        extract_fn=extract_fn, styles=styles,
        style_weight=args.style_weight, content_weight=args.content_weight,
        tv_weight=args.tv_weight, init=args.style_init,
    )


def _require_model_args(args):
    if not args.config_path or not args.model_path:
        raise SystemExit(
            "--config_path and --model_path are required unless --artifact "
            "is given"
        )


def build_service(args, crop: int = 224):
    """The configured (unstarted) StyleTransferService — from model+config
    flags, or from an AOT artifact with everything baked in."""
    from ..tasks.style_service import StyleTransferService

    if args.net:
        import os

        from ..checkpoint.io import load_hyperparameters, load_pytree_npz
        from ..nn.transformer_net import net_n_styles
        from ..tasks.fast_style import make_net_job_fn

        params = load_pytree_npz(args.net)
        hyper_path = args.net.replace(".npz", "_hyperparameters.json")
        hyper = (
            load_hyperparameters(hyper_path)
            if os.path.exists(hyper_path) else {}
        )
        net_crop = int(hyper.get("crop", crop))
        fallback = os.path.splitext(str(hyper.get("style_image", "style")))[0]
        style_names = [str(n) for n in hyper.get("style_names", [fallback])]
        n_styles = net_n_styles(params)
        if n_styles is not None and n_styles != len(style_names):
            raise SystemExit(
                f"--net has {n_styles} conditional styles but its "
                f"hyperparameters name {len(style_names)}: {style_names}"
            )
        sizes = [int(s) for s in str(args.batch_size).split(",") if s.strip()]
        kind = (
            f"conditional gallery {style_names}" if n_styles is not None
            else f"style {style_names[0]!r}"
        )
        print(
            f"Feed-forward net: {kind}, crop {net_crop} "
            f"(one forward per job)", flush=True,
        )
        # the net forward is traceable, so the multi-size dispatch ladder
        # works exactly as in the iterative modes: the same job_fn under
        # every size — the dispatcher picks the smallest compiled size
        # that fits the collected jobs (latency under light load)
        net_job = make_net_job_fn(
            params, crop=net_crop,
            compute_dtype=resolve_compute_dtype(args.precision),
        )
        return StyleTransferService(
            job_fn={s: net_job for s in sizes},
            style_names=style_names,
            crop=net_crop,
            num_iterations=1,
            max_delay_ms=args.max_delay_ms,
            max_in_flight=args.max_in_flight,
            mesh=resolve_eval_mesh(args.devices, _sizes_gcd(sizes)),
            transport=args.transport,
        )
    if args.artifact:
        from ..deploy.artifact import load_style_artifact

        art = load_style_artifact(args.artifact)
        meta = art.meta
        sizes = sorted(art.job_fns)
        print(
            f"Artifact: batch sizes {sizes}, crop {meta['crop']}, "
            f"{meta['num_iterations']} iters, gallery {meta['style_names']}, "
            f"platforms {meta['platforms']}", flush=True,
        )
        # one exported program per size: the dispatcher picks the smallest
        # that fits, exactly as live serving does (multi-size AOT ladder)
        return StyleTransferService(
            job_fn=art.job_fns,
            style_names=meta["style_names"],
            crop=meta["crop"],
            num_iterations=meta["num_iterations"],
            max_delay_ms=args.max_delay_ms,
            max_in_flight=args.max_in_flight,
            transport=args.transport,
        )
    _require_model_args(args)
    if args.style_image:
        kwargs = _build_content_style_kwargs(args)
    else:
        kwargs = dict(gram_fn=_build_gram_fn(args))
    sizes = [int(s) for s in str(args.batch_size).split(",") if s.strip()]
    return StyleTransferService(
        crop=crop,
        **kwargs,
        batch_size=sizes if len(sizes) > 1 else sizes[0],
        max_delay_ms=args.max_delay_ms,
        num_iterations=args.num_iterations,
        threshold=args.threshold,
        learning_rate=args.lr,
        max_in_flight=args.max_in_flight,
        mesh=resolve_eval_mesh(args.devices, _sizes_gcd(sizes)),
        seed=getattr(args, "seed", None) or 0,
        transport=args.transport,
    )


def export_artifact(args) -> None:
    """--export_artifact flow: trace+lower the exact job program the server
    would dispatch (same builder) and write it; exits without serving."""
    from ..deploy.artifact import export_style_artifact, save_style_artifact

    service = build_service(args)
    platforms = (
        [p.strip() for p in args.export_platforms.split(",") if p.strip()]
        if args.export_platforms else None
    )
    blobs, meta = export_style_artifact(service, platforms=platforms)
    save_style_artifact(args.export_artifact, blobs, meta)
    total = sum(len(b) for b in blobs.values())
    print(
        f"Style artifact written to {args.export_artifact} "
        f"({total / 1e6:.1f} MB StableHLO, batch sizes "
        f"{meta['batch_sizes']}, platforms {meta['platforms']})"
    )


def start(args, crop: int = 224):
    """Build the service + HTTP server and start both (returns (srv,
    service); used by main() and callable programmatically/from tests)."""
    from ..tasks.style_http import make_style_http_server

    start_profile(args.profile_dir)
    service = build_service(args, crop=crop).start()
    if not args.no_warmup:
        print("Warming up (AOT compile)...", flush=True)
        t0 = time.time()
        service.warmup()
        print(f"Warmup done in {time.time() - t0:.1f}s")
    srv = make_style_http_server(
        service, args.host, args.port, timeout_s=args.request_timeout
    )
    return srv, service


def _recycle_worker(argv):
    """Builder run INSIDE the recycling worker child (tasks/recycling.py):
    reconstructs the exact configured style service from the serve argv."""
    args = build_parser().parse_args(argv)
    apply_debug_flags(args)
    start_profile(args.profile_dir)
    service = build_service(args).start()
    if not args.no_warmup:
        print("Warming up (AOT compile)...", flush=True)
        t0 = time.time()
        service.warmup()
        print(f"Warmup done in {time.time() - t0:.1f}s")
    info = {
        "crop": service.crop,
        "transport": service.transport,
        "style_names": list(service.style_names),
        "batch_sizes": list(service.batch_sizes),
        "num_iterations": service.num_iterations,
        "count_key": "jobs",
        "max_queue": service.max_queue,
    }
    return service, info


def _recycle_preprocess(info):
    """Parent-side submit preprocessing for the recycling proxy: the same
    canvas validation/downscale and style-pick validation
    ``StyleTransferService.submit`` runs, in the HTTP request thread (bad
    requests still 400 synchronously)."""
    crop = int(info["crop"])
    names = list(info["style_names"])

    def prep(image, style=None):
        from ..tasks.style_service import _to_canvas, style_weights

        image = _to_canvas(image, crop)
        if names:
            style_weights(style, names)  # validate only; the worker recomputes
        elif style is not None:
            raise ValueError("texture mode takes no style= (no gallery)")
        return (image,), {"style": style}

    return prep


def start_recycling(args, argv):
    """--recycle_after_requests flow: the job service lives in a spawned
    worker process (respawned after N requests, drained first); this parent
    keeps only the HTTP server and never touches the accelerator. Returns
    (srv, proxy) with the same surface as ``start``."""
    from ..tasks.recycling import RecyclingServiceProxy, strip_flag
    from ..tasks.style_http import make_style_http_server

    proxy = RecyclingServiceProxy(
        "heuristique_style_transfer_code_tpu.cli.serve_style:_recycle_worker",
        strip_flag(list(argv), "--recycle_after_requests"),
        recycle_after=args.recycle_after_requests,
        preprocess_factory=_recycle_preprocess,
    ).start()
    srv = make_style_http_server(
        proxy, args.host, args.port, timeout_s=args.request_timeout
    )
    return srv, proxy


def main(argv=None):
    import sys

    raw_argv = list(sys.argv[1:] if argv is None else argv)
    args = build_parser().parse_args(raw_argv)
    apply_debug_flags(args)
    if args.export_artifact:
        export_artifact(args)
        return
    # SIGTERM = orchestrated shutdown (systemd/k8s): stop accepting, drain
    # submitted jobs, exit — registered BEFORE the warmup so a signal landing
    # mid-compile still shuts down cleanly (same contract as cli/serve)
    import signal
    import threading

    stop_requested = {"flag": False}

    def _on_sigterm(signum, frame):
        stop_requested["flag"] = True

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # not the main thread (programmatic use)
    if args.recycle_after_requests:
        srv, service = start_recycling(args, raw_argv)
    else:
        srv, service = start(args)
    host, port = srv.server_address[:2]
    batch_str = ",".join(str(s) for s in service.batch_sizes)
    print(f"Serving style transfer on http://{host}:{port} "
          f"(batch {batch_str}, {service.num_iterations} iters, "
          f"{args.precision})", flush=True)
    if service.style_names:
        print(f"Style gallery: {service.style_names}", flush=True)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
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
        service.stop(drain=True)
        stats = service.stats()
        print(f"Stats: {stats['jobs']} jobs in {stats['batches']} batches "
              f"(mean occupancy {stats['mean_batch_occupancy']:.2f}, "
              f"mean iterations {stats['mean_iterations']:.0f})")


if __name__ == "__main__":
    main()
