"""Tasks layer: style transfer loop, classification harness, gradcam,
clustering, tsne artifacts, camera inference fn."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
from heuristique_style_transfer_code_tpu.data.loader import HostLoader


class TestStyleTransferLoop:
    def test_converges_on_quadratic_gram(self):
        """The jitted while_loop must reduce the gram MSE and stop early
        once below threshold."""
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_style_transfer_optimizer,
        )
        from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc

        def gram_fn(imgs):  # identity "encoder": gram of the raw pixels
            return [gram_matrix_nhwc(imgs)]

        opt = make_style_transfer_optimizer(
            gram_fn, learning_rate=0.05, num_iterations=300, threshold=1e-4
        )
        key = jax.random.PRNGKey(0)
        target_img = jax.random.uniform(key, (2, 16, 16, 3))
        targets = gram_fn(target_img)
        noise0 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        final, iters, per_loss = opt(noise0, targets)
        start_loss = float(
            jnp.mean(jnp.square(gram_fn(noise0)[0] - targets[0]))
        )
        assert float(per_loss.max()) < start_loss / 10
        assert int(iters) <= 300

    def test_early_stop_below_threshold(self):
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_style_transfer_optimizer,
        )

        def gram_fn(imgs):
            return [jnp.mean(imgs, axis=(1, 2))]  # (B, C) trivial "gram"

        opt = make_style_transfer_optimizer(
            gram_fn, learning_rate=0.5, num_iterations=1000, threshold=1e-3
        )
        noise0 = jnp.ones((1, 8, 8, 3))
        targets = [jnp.mean(noise0, axis=(1, 2)) + 0.01]
        final, iters, per_loss = opt(noise0, targets)
        assert int(iters) < 1000  # stopped early
        assert float(per_loss[0]) < 1e-3

    def test_gram_attention_style_transfer_artifacts(self, tiny_imagefolder, tmp_path, family1):
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            style_transfer_gram_attention,
        )

        variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples[:2], batch_size=2)
        saved = style_transfer_gram_attention(
            variables,
            loader,
            str(tmp_path),
            layers=5,
            threshold=1e-3,
            num_iterations=5,
            learning_rate=0.05,
            truncate_layer=5,
        )
        assert len(saved) == 2
        for p in saved:
            assert os.path.exists(p)
            assert "style_transfer_" in p

    def test_mesh_sharded_loop_matches_single_device(self):
        """mesh= batch-shards the pixel optimisations over 'data'; the only
        collective is the any(active) early-stop reduction, so results must
        match single-device numerically (the matmul tiling differs per shard
        width, so 40 Adam steps accumulate ~1e-10 drift, not bit-equality)."""
        from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc
        from heuristique_style_transfer_code_tpu.parallel.sharding import make_mesh_2d
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_style_transfer_optimizer,
        )

        def gram_fn(imgs):
            return [gram_matrix_nhwc(imgs)]

        key = jax.random.PRNGKey(0)
        target_img = jax.random.uniform(key, (8, 16, 16, 3))
        targets = gram_fn(target_img)
        noise0 = jax.random.normal(jax.random.PRNGKey(1), (8, 16, 16, 3))

        single = make_style_transfer_optimizer(gram_fn, 0.05, 40, 1e-4)
        mesh = make_mesh_2d(8, model_parallel=1)
        sharded = make_style_transfer_optimizer(gram_fn, 0.05, 40, 1e-4, mesh=mesh)

        n_a, i_a, per_a = single(noise0, targets)
        n_b, i_b, per_b = sharded(noise0, targets)
        assert int(i_a) == int(i_b)
        np.testing.assert_allclose(np.asarray(per_a), np.asarray(per_b), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(n_a), np.asarray(n_b), atol=1e-4)

    def test_spatial_sharded_loop_matches_single_device(self):
        """A mesh with a 'spatial' axis additionally shards each canvas's H
        rows — the big-canvas path. The gram_fn here contains a 3x3 conv so
        the sharded loop exercises GSPMD's halo exchanges in BOTH directions
        (forward + the pixel-gradient transpose) every Adam iteration, plus
        the spatial all-reduce of the Gram contraction."""
        from heuristique_style_transfer_code_tpu.ops.conv import conv2d, conv2d_init
        from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_spatial,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_style_transfer_optimizer,
        )

        conv = conv2d_init(jax.random.PRNGKey(7), 3, 8, 3)

        def gram_fn(imgs):
            return [gram_matrix_nhwc(conv2d(conv, imgs, stride=1, padding=1))]

        key = jax.random.PRNGKey(0)
        target_img = jax.random.uniform(key, (2, 16, 16, 3))
        targets = gram_fn(target_img)
        noise0 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))

        single = make_style_transfer_optimizer(gram_fn, 0.05, 40, 1e-4)
        mesh = make_mesh_spatial(8, spatial=4)  # data=2 x spatial=4
        assert dict(mesh.shape) == {"data": 2, "spatial": 4}
        sharded = make_style_transfer_optimizer(gram_fn, 0.05, 40, 1e-4, mesh=mesh)

        n_a, i_a, per_a = single(noise0, targets)
        n_b, i_b, per_b = sharded(noise0, targets)
        assert int(i_a) == int(i_b)
        np.testing.assert_allclose(np.asarray(per_a), np.asarray(per_b), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(n_a), np.asarray(n_b), atol=1e-4)

    def test_bf16_compute_path_converges_like_f32(self, tiny_imagefolder, tmp_path):
        """compute_dtype=bfloat16 (the shipped fast path: bf16 encoder
        fwd/bwd, f32 pixels/Adam/loss — +63-128% on TPU, PERF.md) must
        produce artifacts and a final pixel state close to the f32 loop."""
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            style_transfer_gram_attention,
        )

        variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples[:2], batch_size=2)
        outs = {}
        for name, dtype in (("f32", None), ("bf16", jnp.bfloat16)):
            saved = style_transfer_gram_attention(
                variables, loader, str(tmp_path / name),
                layers=5, threshold=0.0, num_iterations=20,
                learning_rate=0.05, truncate_layer=5,
                key=jax.random.PRNGKey(3), compute_dtype=dtype,
            )
            assert len(saved) == 2
            import matplotlib.image as mpimg

            outs[name] = np.stack([mpimg.imread(p) for p in saved])
        # identical noise seed + 20 Adam steps: bf16 gradients keep the
        # trajectories close (loose tolerance — 20 compounding bf16 steps)
        d = np.abs(outs["f32"].astype(np.float32) - outs["bf16"].astype(np.float32))
        assert d.mean() < 0.05, d.mean()


class TestClassificationHarness:
    def test_artifacts_and_metrics(self, tiny_imagefolder, tmp_path, family1):
        from heuristique_style_transfer_code_tpu.tasks.classification import (
            run_classification_test,
        )

        cfg, variables, forward_eval = family1
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples, batch_size=4)
        save_dir = str(tmp_path / "cls")
        res = run_classification_test(
            forward_eval,
            variables,
            loader,
            idx.samples,
            idx.classes,
            save_dir,
            prob_threshold=0.0,
            measure_time=True,
            compute_auc=True,
        )
        assert os.path.exists(os.path.join(save_dir, "metrics.txt"))
        assert os.path.exists(os.path.join(save_dir, "confusion_matrix.png"))
        assert os.path.exists(os.path.join(save_dir, "times_test.json"))
        assert res["confusion_matrix"].sum() == len(idx)
        assert 0 <= res["accuracy"] <= 100
        if res["auc"] is not None:
            assert 0 <= res["auc"] <= 1

    def test_threshold_produces_unknown(self, tiny_imagefolder, tmp_path, family1):
        from heuristique_style_transfer_code_tpu.tasks.classification import (
            run_classification_test,
        )

        cfg, variables, forward_eval = family1
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples, batch_size=4)
        res = run_classification_test(
            forward_eval, variables, loader, idx.samples, idx.classes,
            str(tmp_path / "cls2"), prob_threshold=1.01,
        )
        assert (res["preds"] == -1).all()  # everything Unknown
        assert res["accuracy"] == 0.0


class TestEmbeddingsAndTsne:
    def test_embeddings_paths_order(self, tiny_imagefolder, family1):
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            truncated_moco_apply,
        )
        from heuristique_style_transfer_code_tpu.tasks.embeddings import (
            compute_embeddings_with_paths,
        )

        cfg, variables, _ = family1
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples, batch_size=5)

        def embed(v, images):
            emb, _ = truncated_moco_apply(v["moco"], images, cfg.truncate_layer)
            return emb

        emb, labels, paths = compute_embeddings_with_paths(
            embed, variables, loader, idx.samples
        )
        assert emb.shape == (12, 16)
        assert list(labels) == idx.labels
        assert paths == idx.paths  # no Subset duplication bug

    def test_static_tsne_plot(self, tmp_path):
        from heuristique_style_transfer_code_tpu.tasks.tsne import perform_tsne

        rng = np.random.RandomState(0)
        emb = rng.randn(20, 8)
        labels = np.repeat([0, 1, 2, 3], 5)
        path = perform_tsne(emb, labels, ["fog", "rain", "snow", "sun"],
                            results_dir=str(tmp_path))
        assert os.path.exists(path)

    def test_polygon_analysis_artifacts(self, tmp_path):
        from heuristique_style_transfer_code_tpu.tasks.tsne import analyze_polygon_points

        pts = np.array([[0.0, 0.0], [5.0, 5.0], [0.2, 0.2]])
        polygon = [(-1, -1), (1, -1), (1, 1), (-1, 1)]
        inside, outside = analyze_polygon_points(
            pts, polygon, [0, 1, 0], ["a", "b"], ["p0", "p1", "p2"], str(tmp_path)
        )
        assert len(inside) == 2 and len(outside) == 1
        with open(os.path.join(str(tmp_path), "inside_polygon.json")) as f:
            data = json.load(f)
        assert {d["path"] for d in data} == {"p0", "p2"}

    def test_interactive_controller_headless(self, tiny_imagefolder, tmp_path):
        """The FULL interactive-GUI behaviour (pick -> image+label, z/a zoom,
        right-click polygon selector, analyze -> JSON + dropdown, clear)
        executed on an Agg canvas with a fake view — only the ~30 lines of
        literal Tk widget construction remain display-bound."""
        from types import SimpleNamespace

        import matplotlib

        matplotlib.use("Agg")
        from heuristique_style_transfer_code_tpu.tasks.tsne import (
            TsneInteractiveController,
        )

        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        paths = idx.paths[:6]
        labels = np.asarray(idx.labels[:6])
        pts = np.array(
            [[0.0, 0.0], [0.5, 0.5], [5.0, 5.0], [-4.0, 2.0], [0.1, -0.2], [6.0, -6.0]]
        )

        class FakeView:
            def __init__(self):
                self.image = None
                self.label = None
                self.inside = None
                self.dropdown = None

            def set_image(self, img):
                self.image = img

            def set_label(self, t):
                self.label = t

            def set_inside_count(self, t):
                self.inside = t

            def set_dropdown(self, values, current):
                self.dropdown = (values, current)

        view = FakeView()
        ctl = TsneInteractiveController(
            pts, labels, ["fog", "rain", "snow", "sun"], paths, view, str(tmp_path)
        )
        # pick point 2 -> its image loads (400x400) and the label is set
        ctl.onpick(SimpleNamespace(ind=[2]))
        assert view.image.size == (400, 400)
        assert view.label == f"Label: {['fog','rain','snow','sun'][labels[2]]}"
        # z zooms in (narrower limits), a zooms out
        x0, x1 = ctl.ax.get_xlim()
        ctl.on_key(SimpleNamespace(key="z", xdata=0.0, ydata=0.0))
        zx0, zx1 = ctl.ax.get_xlim()
        assert (zx1 - zx0) < (x1 - x0)
        ctl.on_key(SimpleNamespace(key="a", xdata=0.0, ydata=0.0))
        ax0, ax1 = ctl.ax.get_xlim()
        assert (ax1 - ax0) > (zx1 - zx0)
        # off-canvas key (xdata None) is a no-op, not a crash
        ctl.on_key(SimpleNamespace(key="z", xdata=None, ydata=None))
        # right-click enables the PolygonSelector on the Agg canvas
        ctl.enable_polygon_selector(SimpleNamespace(button=3))
        assert ctl._selector is not None
        # too-few vertices: refused
        ctl.onselect([(-1.0, -1.0), (1.0, -1.0)])
        assert ctl.analyze() is None
        # a square around the origin: points 0, 1(edge 0.5), 4 inside
        ctl.onselect([(-1.0, -1.0), (1.0, -1.0), (1.0, 1.0), (-1.0, 1.0)])
        inside = ctl.analyze()
        assert {p["path"] for p in inside} == {paths[0], paths[1], paths[4]}
        assert view.inside == "Points inside polygon: 3"
        values, current = view.dropdown
        assert len(values) == 3 and current == 0
        assert os.path.exists(os.path.join(str(tmp_path), "inside_polygon.json"))
        # clear resets everything
        ctl.clear()
        assert ctl.polygon == [] and ctl._selector is None and ctl._cleared
        assert view.inside == "" and view.label == ""


class TestClustering:
    def test_grid_search_and_artifact(self, tmp_path):
        from heuristique_style_transfer_code_tpu.tasks.clustering import run_clustering

        rng = np.random.RandomState(0)
        # two obvious blobs inside class 0
        emb = np.concatenate([rng.randn(20, 4), rng.randn(20, 4) + 8.0])
        labels = np.zeros(40, dtype=int)
        paths = [f"img_{i}.png" for i in range(40)]
        res = run_clustering(
            emb, labels, paths, ["fog"], "fog",
            min_cluster_sizes=[5], min_samples_list=[3],
            save_dir=str(tmp_path), interactive=False,
        )
        assert res["num_clusters"] >= 2
        assert os.path.exists(os.path.join(str(tmp_path), "fog_clustering_results.json"))


class TestGradCAM:
    def test_cam_shape_and_range(self, tiny_imagefolder, family1):
        from heuristique_style_transfer_code_tpu.tasks.gradcam import gradcam_moco

        cfg, variables, _ = family1
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        from heuristique_style_transfer_code_tpu.data.loader import load_image_staged

        img = load_image_staged(idx.samples[0][0])[None]
        cam = np.asarray(gradcam_moco(variables, img, [0], truncate=cfg.truncate_layer))
        assert cam.shape == (1, 224, 224)
        assert cam.min() >= 0.0 and cam.max() <= 1.0 + 1e-6

    def test_overlay_file(self, tiny_imagefolder, tmp_path, family1):
        from heuristique_style_transfer_code_tpu.tasks.gradcam import (
            generate_heatmap_overlays,
            gradcam_moco,
        )
        from heuristique_style_transfer_code_tpu.data.loader import load_image_staged

        cfg, variables, _ = family1
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        img = load_image_staged(idx.samples[0][0])[None]
        cam = np.asarray(gradcam_moco(variables, img, [1], truncate=cfg.truncate_layer))[0]
        out = str(tmp_path / "cam.png")
        combined = generate_heatmap_overlays(cam, idx.samples[0][0], out, colormap="jet")
        assert os.path.exists(out)
        assert combined.shape == (224, 224 * 3, 3)


class TestCamera:
    def test_infer_fn_and_video_source(self, tmp_path, family1):
        import cv2

        from heuristique_style_transfer_code_tpu.tasks.camera import (
            make_camera_infer_fn,
            run_camera,
        )

        cfg, variables, forward_eval = family1
        # synthetic AVI as the "camera"
        video_path = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(5):
            w.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()

        infer = make_camera_infer_fn(forward_eval)
        frame = rng.randint(0, 255, (48, 64, 3), dtype=np.uint8)
        probs = np.asarray(infer(variables, jnp.asarray(frame)))
        assert probs.shape == (4,) and abs(probs.sum() - 1.0) < 1e-5

        summary = run_camera(
            forward_eval, variables, ["fog", "rain", "snow", "sun"],
            save_dir=str(tmp_path), measure_time=True, camera_index=video_path,
            max_frames=5, display=False, kalman_filter=True,
        )
        assert summary["frames"] == 5
        assert os.path.exists(os.path.join(str(tmp_path), "times_camera.json"))
        assert summary["fps"] > 0

        # yuv420 transport: same loop, half the shipped bytes
        summary_yuv = run_camera(
            forward_eval, variables, ["fog", "rain", "snow", "sun"],
            save_dir=str(tmp_path), camera_index=video_path,
            max_frames=5, display=False, transport="yuv420", pipeline_depth=2,
        )
        assert summary_yuv["frames"] == 5


class TestYuvDeltaTransport:
    def _video(self, n=6, size=48, seed=0):
        """Correlated synthetic 'video': base frame + small per-frame drift
        (the temporal structure real cameras emit)."""
        rng = np.random.RandomState(seed)
        cur = rng.randint(0, 256, (size, size, 3), dtype=np.uint8).astype(np.int16)
        frames = []
        for _ in range(n):
            cur = np.clip(cur + rng.randint(-2, 3, cur.shape), 0, 255)
            frames.append(cur.astype(np.uint8))
        return frames

    def test_roundtrip_exact(self):
        from heuristique_style_transfer_code_tpu.tasks.camera import (
            rgb_to_yuv420,
            yuv420_delta_decode_device,
            yuv420_delta_encode,
        )

        yuv = np.stack([rgb_to_yuv420(f) for f in self._video()])
        enc = yuv420_delta_encode(yuv)
        assert enc.dtype == np.uint8
        # frame 0 ships raw; later deltas are low-entropy for correlated video
        np.testing.assert_array_equal(enc[0], yuv[0])
        dec = np.asarray(yuv420_delta_decode_device(jnp.asarray(enc)))
        np.testing.assert_array_equal(dec, yuv)

    def test_batched_infer_matches_plain(self, family1):
        """The reconstructed pixels are bit-exact (roundtrip test above), so
        the only divergence vs the plain yuv420 program is XLA fusing the
        float YUV->RGB math differently in the two compilations — rounding-
        level, never an argmax change."""
        from heuristique_style_transfer_code_tpu.tasks.camera import (
            make_camera_infer_fn_yuv,
            rgb_to_yuv420,
            yuv420_delta_encode,
        )

        cfg, variables, forward_eval = family1
        yuv = np.stack([rgb_to_yuv420(f) for f in self._video()])
        plain = make_camera_infer_fn_yuv(forward_eval, 48, batch=6)
        delta = make_camera_infer_fn_yuv(forward_eval, 48, batch=6, delta=True)
        p_plain = np.asarray(plain(variables, jnp.asarray(yuv)))
        p_delta = np.asarray(delta(variables, jnp.asarray(yuv420_delta_encode(yuv))))
        np.testing.assert_array_equal(p_delta.argmax(-1), p_plain.argmax(-1))
        np.testing.assert_allclose(p_delta, p_plain, atol=1e-5)

    def test_stateful_batch1_matches_plain(self, family1):
        from heuristique_style_transfer_code_tpu.tasks.camera import (
            make_camera_infer_fn_yuv,
            make_camera_infer_fn_yuv_delta1,
            rgb_to_yuv420,
        )

        cfg, variables, forward_eval = family1
        frames = [rgb_to_yuv420(f) for f in self._video()]
        plain = make_camera_infer_fn_yuv(forward_eval, 48)
        delta1 = make_camera_infer_fn_yuv_delta1(forward_eval, 48)
        prev_host = np.zeros_like(frames[0])
        prev_dev = jnp.zeros(frames[0].shape, dtype=jnp.uint8)
        for f in frames:
            payload = f - prev_host  # uint8 wraparound
            prev_host = f
            probs, prev_dev = delta1(variables, prev_dev, jnp.asarray(payload))
            ref = np.asarray(plain(variables, jnp.asarray(f)))
            # pixel reconstruction is bit-exact (asserted below via prev_dev),
            # but probs come from two different XLA programs — hold them to
            # the same rounding tolerance as the batched test, not bit-equal
            np.testing.assert_array_equal(
                np.asarray(probs).argmax(-1), ref.argmax(-1)
            )
            np.testing.assert_allclose(np.asarray(probs), ref, atol=1e-5)
        # the carried device frame is the exact last input
        np.testing.assert_array_equal(np.asarray(prev_dev), frames[-1])

    def test_run_camera_delta_transport(self, tmp_path, family1):
        import cv2

        from heuristique_style_transfer_code_tpu.tasks.camera import run_camera

        cfg, variables, forward_eval = family1
        video_path = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
        for f in self._video(n=5, size=48):
            w.write(cv2.cvtColor(np.pad(f, ((0, 0), (0, 16), (0, 0)), mode="edge"),
                                 cv2.COLOR_RGB2BGR))
        w.release()

        kwargs = dict(save_dir=str(tmp_path), camera_index=video_path,
                      max_frames=5, display=False)
        s_yuv = run_camera(forward_eval, variables,
                           ["fog", "rain", "snow", "sun"],
                           transport="yuv420", **kwargs)
        s_delta = run_camera(forward_eval, variables,
                             ["fog", "rain", "snow", "sun"],
                             transport="yuv420_delta", **kwargs)
        # bit-exact reconstruction => identical final prediction
        assert s_delta["frames"] == 5
        assert s_delta["last_label"] == s_yuv["last_label"]
        assert abs(s_delta["last_prob"] - s_yuv["last_prob"]) < 1e-6
        # pipelined dispatch works with the carried device state too
        s_pipe = run_camera(forward_eval, variables,
                            ["fog", "rain", "snow", "sun"],
                            transport="yuv420_delta", pipeline_depth=2,
                            **kwargs)
        assert s_pipe["frames"] == 5
        assert s_pipe["last_label"] == s_yuv["last_label"]


class TestCameraRecording:
    def test_save_video_headless(self, tmp_path, family1):
        """--save_camera_video writes camera_output.avi without a display."""
        import cv2

        from heuristique_style_transfer_code_tpu.tasks.camera import run_camera

        cfg, variables, forward_eval = family1
        video_path = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(4):
            w.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()

        summary = run_camera(
            forward_eval, variables, ["fog", "rain", "snow", "sun"],
            save_video=True, save_dir=str(tmp_path), camera_index=video_path,
            max_frames=4, display=False,
        )
        out = os.path.join(str(tmp_path), "camera_output.avi")
        assert summary["frames"] == 4
        assert os.path.exists(out) and os.path.getsize(out) > 0
        cap = cv2.VideoCapture(out)
        ok, frame = cap.read()
        cap.release()
        assert ok and frame.shape[2] == 3


class TestTBLogging:
    def test_writer_receives_images(self, tiny_imagefolder, tmp_path, family1):
        from heuristique_style_transfer_code_tpu.tasks.classification import (
            run_classification_test,
        )

        class FakeWriter:
            def __init__(self):
                self.images, self.texts = [], []

            def add_image(self, tag, img, global_step=None):
                self.images.append((tag, img.shape))

            def add_text(self, tag, text, global_step=None):
                self.texts.append(tag)

        cfg, variables, forward_eval = family1
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples[:4], batch_size=4)
        writer = FakeWriter()
        run_classification_test(
            forward_eval, variables, loader, idx.samples, idx.classes,
            str(tmp_path / "tb"), save_test_images=True, writer=writer,
        )
        assert len(writer.images) == 4 and len(writer.texts) == 4


class TestYUVTransfer:
    def test_yuv_roundtrip_matches_cv2(self):
        import cv2
        from heuristique_style_transfer_code_tpu.tasks.camera import (
            rgb_to_yuv420,
            yuv420_to_rgb_device,
        )

        rng = np.random.RandomState(0)
        base = rng.randint(0, 256, (14, 14, 3)).astype(np.uint8)
        rgb = cv2.resize(base, (224, 224), interpolation=cv2.INTER_CUBIC)
        yuv = rgb_to_yuv420(rgb)
        assert yuv.shape == (336, 224)
        back = np.asarray(yuv420_to_rgb_device(jnp.asarray(yuv), 224, 224)) * 255
        cv2_back = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB_I420).astype(np.float32)
        assert np.abs(back - cv2_back).mean() < 0.5  # matches cv2's inverse

    def test_yuv_infer_matches_rgb_predictions(self, family1):
        import cv2
        from heuristique_style_transfer_code_tpu.tasks.camera import (
            make_camera_infer_fn,
            make_camera_infer_fn_yuv,
            rgb_to_yuv420,
        )

        cfg, variables, forward_eval = family1
        rng = np.random.RandomState(1)
        base = rng.randint(0, 256, (4, 14, 14, 3)).astype(np.uint8)
        rgb = np.stack([
            cv2.resize(b, (224, 224), interpolation=cv2.INTER_CUBIC) for b in base
        ])
        yuv = np.stack([rgb_to_yuv420(f) for f in rgb])
        inferR = make_camera_infer_fn(forward_eval, batch=4, host_downscale=True)
        inferY = make_camera_infer_fn_yuv(forward_eval, 224, batch=4)
        pr = np.asarray(inferR(variables, jnp.asarray(rgb)))
        py = np.asarray(inferY(variables, jnp.asarray(yuv)))
        np.testing.assert_allclose(py, pr, atol=0.06)  # 4:2:0 chroma tolerance


class TestCameraPipelined:
    def test_pipelined_file_processing(self, tmp_path, family1):
        import cv2

        from heuristique_style_transfer_code_tpu.tasks.camera import run_camera

        cfg, variables, forward_eval = family1
        video_path = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(8):
            w.write(rng.randint(0, 255, (48, 64, 3), dtype=np.uint8))
        w.release()

        summary = run_camera(
            forward_eval, variables, ["fog", "rain", "snow", "sun"],
            save_dir=str(tmp_path), measure_time=True, camera_index=video_path,
            display=False, pipeline_depth=3,
        )
        assert summary["frames"] == 8
        with open(os.path.join(str(tmp_path), "times_camera.json")) as f:
            assert len(json.load(f)) == 8  # every frame's result was collected
