"""StyleTransferService: batched style-transfer jobs, composition
invariance, HTTP front end, and the serve_style CLI end-to-end.

The service's central claim — a job's result does not depend on what it
shares a batch with (masked updates freeze converged lanes, gradients never
couple lanes, noise seeds derive from job ids) — is asserted bit-exactly.
"""
import io
import json
import os
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc
from heuristique_style_transfer_code_tpu.tasks.style_service import (
    StyleTransferService,
)

CROP = 16


def _pixel_gram_fn(images):
    """Toy per-image target: the 3x3 channel Gram of the (normalised)
    pixels — the cheapest program with the task's exact structure."""
    return [gram_matrix_nhwc(images)]


def _service(**kw):
    kw.setdefault("crop", CROP)
    kw.setdefault("batch_size", 4)
    kw.setdefault("max_delay_ms", 150.0)
    kw.setdefault("num_iterations", 25)
    kw.setdefault("threshold", 1e-8)  # never converges: deterministic cap
    kw.setdefault("learning_rate", 0.05)
    kw.setdefault("seed", 0)
    return StyleTransferService(_pixel_gram_fn, **kw)


def _images(n, seed=0):
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (CROP, CROP, 3), np.uint8) for _ in range(n)]


class TestService:
    def test_jobs_batch_and_resolve(self):
        imgs = _images(6, seed=1)
        with _service() as svc:
            futs = [None] * 6

            def client(lo, hi):
                for i in range(lo, hi):
                    futs[i] = svc.submit(imgs[i])

            threads = [
                threading.Thread(target=client, args=(k * 3, (k + 1) * 3))
                for k in range(2)
            ]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            results = [f.result(timeout=120) for f in futs]
        for r in results:
            assert r.image.shape == (CROP, CROP, 3)
            assert r.image.dtype == np.uint8
            assert np.isfinite(r.loss)
            assert 0 < r.iterations <= 25
        st = svc.stats()
        assert st["jobs"] == 6
        assert st["batches"] >= 2
        assert st["mean_iterations"] > 0

    def test_result_independent_of_batch_composition(self):
        """Job A alone in a padded batch == job A sharing a full batch —
        bit-exact (same seed -> same job-0 noise; lanes never couple)."""
        imgs = _images(4, seed=2)
        with _service() as s1:
            r_alone = s1.submit(imgs[0]).result(timeout=120)
        with _service() as s2:
            fa = s2.submit(imgs[0])  # job id 0, as in s1
            others = [s2.submit(im) for im in imgs[1:]]
            r_full = fa.result(timeout=120)
            for f in others:
                f.result(timeout=120)
        np.testing.assert_array_equal(r_alone.image, r_full.image)
        assert r_alone.loss == pytest.approx(r_full.loss, rel=1e-6)

    def test_deterministic_across_instances(self):
        imgs = _images(2, seed=3)
        outs = []
        for _ in range(2):
            with _service() as svc:
                futs = [svc.submit(im) for im in imgs]
                outs.append([f.result(timeout=120).image for f in futs])
        np.testing.assert_array_equal(outs[0][0], outs[1][0])
        np.testing.assert_array_equal(outs[0][1], outs[1][1])

    def test_early_stop_reports_convergence(self):
        """A reachable threshold stops the batch early and the reported loss
        is below it."""
        imgs = _images(2, seed=4)
        with _service(threshold=5e-2, num_iterations=400) as svc:
            rs = [svc.submit(im).result(timeout=240) for im in imgs]
        for r in rs:
            assert r.loss < 5e-2
            assert r.iterations < 400

    def test_large_image_downscaled_in_submit(self):
        img = np.random.RandomState(5).randint(
            0, 256, (3 * CROP, 2 * CROP, 3), np.uint8
        )
        with _service() as svc:
            r = svc.submit(img).result(timeout=120)
        assert r.image.shape == (CROP, CROP, 3)

    def test_malformed_job_rejected_in_submit(self):
        with _service() as svc:
            with pytest.raises(ValueError):
                svc.submit(np.zeros((CROP, CROP), np.uint8))
            with pytest.raises(ValueError):
                svc.submit(np.zeros((CROP, CROP, 4), np.uint8))
            with pytest.raises(ValueError):
                svc.submit(np.zeros((CROP, CROP, 3), np.float32))
            # the service still works after rejected submits
            r = svc.submit(_images(1, seed=6)[0]).result(timeout=120)
            assert r.image.shape == (CROP, CROP, 3)

    def test_multi_size_dispatch(self):
        """batch_size=(2, 4): a lone job dispatches at the SMALL compiled
        size, a 4-job burst at the big one; a small-size result is
        bit-identical to a dedicated batch_size=2 service (same compiled
        program, same job id)."""
        imgs = _images(4, seed=50)
        with _service(batch_size=(2, 4)) as svc:
            assert svc.batch_sizes == [2, 4] and svc.batch_size == 4
            r_lone = svc.submit(imgs[0]).result(timeout=120)
            futs = [svc.submit(im) for im in imgs]
            for f in futs:
                f.result(timeout=120)
            hist = svc.stats()["batch_size_hist"]
        assert hist.get("2", 0) >= 1  # the lone job rode the small size
        assert hist.get("4", 0) >= 1  # the burst rode the big one
        with _service(batch_size=2) as ref:
            r_ref = ref.submit(imgs[0]).result(timeout=120)  # job id 0 too
        np.testing.assert_array_equal(r_lone.image, r_ref.image)

    def test_multi_size_validation(self):
        with pytest.raises(ValueError, match=">= 1"):
            _service(batch_size=(0, 4))
        with pytest.raises(ValueError, match="ONE batch shape"):
            StyleTransferService(
                job_fn=lambda *a: a, style_names=["a"], batch_size=(2, 4),
            )

    def test_multi_size_warmup(self):
        svc = _service(batch_size=(2, 4))
        svc.warmup()  # compiles both sizes without running either
        svc.start()
        try:
            r = svc.submit(_images(1, seed=51)[0]).result(timeout=120)
            assert r.image.shape == (CROP, CROP, 3)
        finally:
            svc.stop()

    def test_submit_after_stop_raises(self):
        svc = _service().start()
        svc.stop()
        with pytest.raises(RuntimeError):
            svc.submit(_images(1)[0])

    def test_warmup_compiles_without_running(self):
        svc = _service()
        svc.warmup()  # must not execute the loop (returns fast) or throw
        svc.start()
        try:
            r = svc.submit(_images(1, seed=7)[0]).result(timeout=120)
            assert r.image.shape == (CROP, CROP, 3)
        finally:
            svc.stop()


def _identity_extract(images):
    return images, [gram_matrix_nhwc(images)]


def _cs_service(**kw):
    """Content+style service over identity features and a 2-style gallery."""
    rng = np.random.RandomState(11)
    styles = {
        "warm": rng.randint(0, 256, (CROP, CROP, 3), np.uint8),
        "cool": rng.randint(0, 256, (CROP, CROP, 3), np.uint8),
    }
    kw.setdefault("crop", CROP)
    kw.setdefault("batch_size", 4)
    kw.setdefault("max_delay_ms", 150.0)
    kw.setdefault("num_iterations", 25)
    kw.setdefault("threshold", 1e-8)
    kw.setdefault("learning_rate", 0.05)
    kw.setdefault("seed", 0)
    kw.setdefault("styles", styles)
    return StyleTransferService(extract_fn=_identity_extract, **kw)


class TestContentStyleService:
    def test_ctor_validation(self):
        with pytest.raises(ValueError, match="exactly one"):
            StyleTransferService()
        with pytest.raises(ValueError, match="exactly one"):
            StyleTransferService(
                _pixel_gram_fn, extract_fn=_identity_extract,
                styles={"a": np.zeros((CROP, CROP, 3), np.uint8)},
            )
        with pytest.raises(ValueError, match="styles"):
            StyleTransferService(extract_fn=_identity_extract)
        with pytest.raises(ValueError, match="styles"):
            StyleTransferService(
                _pixel_gram_fn,
                styles={"a": np.zeros((CROP, CROP, 3), np.uint8)},
            )
        with pytest.raises(ValueError, match="init"):
            _cs_service(init="zeros")

    def test_styles_select_and_differ(self):
        imgs = _images(2, seed=12)
        with _cs_service() as svc:
            assert svc.style_names == ["warm", "cool"]
            r_warm = svc.submit(imgs[0], style="warm").result(timeout=120)
            r_cool = svc.submit(imgs[0], style="cool").result(timeout=120)
            r_default = svc.submit(imgs[0]).result(timeout=120)
        assert not np.array_equal(r_warm.image, r_cool.image)
        np.testing.assert_array_equal(r_warm.image, r_default.image)

    def test_unknown_style_rejected(self):
        with _cs_service() as svc:
            with pytest.raises(ValueError, match="unknown style"):
                svc.submit(_images(1)[0], style="vangogh")
            # service still works after the rejected submit
            r = svc.submit(_images(1, seed=13)[0]).result(timeout=120)
            assert r.image.shape == (CROP, CROP, 3)

    def test_texture_mode_rejects_style(self):
        with _service() as svc:
            with pytest.raises(ValueError, match="texture mode"):
                svc.submit(_images(1)[0], style="warm")

    def test_composition_invariance_noise_init(self):
        """Same claim as the texture test, on the content+style path with
        per-job noise init (exercises the fold_in seed derivation): a job's
        result is bit-identical alone vs sharing a batch with other styles."""
        imgs = _images(4, seed=14)
        with _cs_service(init="noise") as s1:
            r_alone = s1.submit(imgs[0], style="cool").result(timeout=120)
        with _cs_service(init="noise") as s2:
            fa = s2.submit(imgs[0], style="cool")  # job id 0, as in s1
            others = [
                s2.submit(im, style=("warm", "cool")[i % 2])
                for i, im in enumerate(imgs[1:])
            ]
            r_full = fa.result(timeout=120)
            for f in others:
                f.result(timeout=120)
        np.testing.assert_array_equal(r_alone.image, r_full.image)

    def test_style_blend(self):
        """{name: weight} interpolates the target Grams: a one-hot dict is
        bit-identical to the plain name pick, and a 50/50 blend differs
        from both endpoints."""
        img = _images(1, seed=30)[0]
        with _cs_service() as svc:
            r_name = svc.submit(img, style="warm").result(timeout=120)
            r_onehot = svc.submit(img, style={"warm": 1.0}).result(timeout=120)
            # weights are normalised: {"warm": 2.0} is the same target
            r_scaled = svc.submit(img, style={"warm": 2.0}).result(timeout=120)
            r_mix = svc.submit(
                img, style={"warm": 0.5, "cool": 0.5}
            ).result(timeout=120)
            r_cool = svc.submit(img, style="cool").result(timeout=120)
        np.testing.assert_array_equal(r_name.image, r_onehot.image)
        np.testing.assert_array_equal(r_name.image, r_scaled.image)
        assert not np.array_equal(r_mix.image, r_name.image)
        assert not np.array_equal(r_mix.image, r_cool.image)

    def test_bad_blends_rejected(self):
        with _cs_service() as svc:
            img = _images(1, seed=31)[0]
            with pytest.raises(ValueError, match="unknown styles"):
                svc.submit(img, style={"warm": 0.5, "nosuch": 0.5})
            with pytest.raises(ValueError, match=">= 0"):
                svc.submit(img, style={"warm": -1.0})
            with pytest.raises(ValueError, match="sum to > 0"):
                svc.submit(img, style={"warm": 0.0, "cool": 0.0})
            r = svc.submit(img).result(timeout=120)  # still healthy
            assert r.image.shape == (CROP, CROP, 3)

    def test_content_init_pulls_toward_content(self):
        """With identity features and a dominant content term, the canvas
        must stay close to the content image (sanity of the mode wiring)."""
        img = _images(1, seed=15)[0]
        with _cs_service(
            style_weight=0.0, content_weight=1.0, num_iterations=10
        ) as svc:
            r = svc.submit(img).result(timeout=120)
        assert np.mean(np.abs(r.image.astype(int) - img.astype(int))) < 3.0

    def test_aot_artifact_round_trip(self, tmp_path):
        """export_style_artifact bakes the job program (weights + gallery)
        into StableHLO; a service over the deserialised program returns the
        same results (allclose — deserialised programs fuse ~1 ULP apart
        from live jit, per deploy/artifact.py's documented contract)."""
        from heuristique_style_transfer_code_tpu.deploy.artifact import (
            export_style_artifact,
            load_style_artifact,
            save_style_artifact,
        )

        imgs = _images(3, seed=40)
        picks = ["warm", "cool", {"warm": 0.5, "cool": 0.5}]
        live = _cs_service()
        blobs, meta = export_style_artifact(live)
        assert meta["style_names"] == ["warm", "cool"]
        assert meta["batch_size"] == 4 and meta["crop"] == CROP
        assert meta["batch_sizes"] == [4] and sorted(blobs) == [4]
        path = str(tmp_path / "style.npz")
        save_style_artifact(path, blobs, meta)

        with live:
            r_live = [
                live.submit(im, style=s).result(timeout=120)
                for im, s in zip(imgs, picks)
            ]

        art = load_style_artifact(path)
        with StyleTransferService(
            job_fn=art.job_fn, style_names=art.meta["style_names"],
            crop=art.meta["crop"], batch_size=art.meta["batch_size"],
            num_iterations=art.meta["num_iterations"],
        ) as svc:
            r_art = [
                svc.submit(im, style=s).result(timeout=120)
                for im, s in zip(imgs, picks)
            ]
        for a, b in zip(r_live, r_art):
            assert a.iterations == b.iterations
            np.testing.assert_allclose(
                a.image.astype(np.int32), b.image.astype(np.int32), atol=1,
            )
            assert a.loss == pytest.approx(b.loss, rel=1e-4)

    def test_job_fn_ctor_validation(self):
        with pytest.raises(ValueError, match="exactly one"):
            StyleTransferService(
                _pixel_gram_fn, job_fn=lambda *a: a,
            )
        with pytest.raises(ValueError, match="style_names"):
            StyleTransferService(_pixel_gram_fn, style_names=["a"])

    def test_warmup_compiles_content_style(self):
        svc = _cs_service()
        svc.warmup()
        svc.start()
        try:
            r = svc.submit(_images(1, seed=16)[0]).result(timeout=120)
            assert r.image.shape == (CROP, CROP, 3)
        finally:
            svc.stop()


def _http_get(url):
    with urllib.request.urlopen(url, timeout=60) as resp:
        return resp.status, resp.read()


def _http_post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, headers=headers or {})
    try:
        with urllib.request.urlopen(req, timeout=240) as resp:
            return resp.status, resp.read(), dict(resp.headers)
    except urllib.error.HTTPError as e:
        return e.code, e.read(), dict(e.headers)


class TestHttp:
    def test_style_http_round_trip(self):
        from heuristique_style_transfer_code_tpu.tasks.style_http import (
            make_style_http_server,
        )

        with _service() as svc:
            srv = make_style_http_server(svc, port=0)
            host, port = srv.server_address[:2]
            t = threading.Thread(target=srv.serve_forever, daemon=True)
            t.start()
            try:
                base = f"http://{host}:{port}"
                code, body = _http_get(base + "/healthz")
                assert code == 200

                img = _images(1, seed=8)[0]
                code, png, headers = _http_post(
                    base + "/style", img.tobytes(),
                    {"X-Raw-Shape": f"{CROP},{CROP},3"},
                )
                assert code == 200
                assert headers["Content-Type"] == "image/png"
                assert int(headers["X-Iterations"]) > 0
                assert float(headers["X-Final-Loss"]) >= 0
                from PIL import Image

                out = np.asarray(Image.open(io.BytesIO(png)))
                assert out.shape == (CROP, CROP, 3)

                code, body = _http_get(base + "/stats")
                stats = json.loads(body)
                assert stats["jobs"] >= 1

                code, body = _http_get(base + "/metrics")
                assert code == 200
                assert b"hst_style_jobs_total" in body
                assert b"hst_style_healthy 1" in body

                # malformed body -> 400, server stays healthy
                code, body, _ = _http_post(
                    base + "/style", b"notanimage",
                    {"X-Raw-Shape": "4,4,1"},
                )
                assert code == 400
                code, _ = _http_get(base + "/healthz")
                assert code == 200

                # texture mode: empty gallery, X-Style rejected
                code, body = _http_get(base + "/styles")
                assert json.loads(body) == {"styles": []}
                code, _, _ = _http_post(
                    base + "/style", img.tobytes(),
                    {"X-Raw-Shape": f"{CROP},{CROP},3", "X-Style": "warm"},
                )
                assert code == 400
            finally:
                srv.shutdown()

    def test_content_style_gallery_over_http(self):
        from heuristique_style_transfer_code_tpu.tasks.style_http import (
            make_style_http_server,
        )

        with _cs_service() as svc:
            srv = make_style_http_server(svc, port=0)
            host, port = srv.server_address[:2]
            threading.Thread(target=srv.serve_forever, daemon=True).start()
            try:
                base = f"http://{host}:{port}"
                code, body = _http_get(base + "/styles")
                assert code == 200
                assert json.loads(body) == {"styles": ["warm", "cool"]}

                img = _images(1, seed=17)[0]
                hdr = {"X-Raw-Shape": f"{CROP},{CROP},3"}
                outs = {}
                for style in ("warm", "cool"):
                    code, png, headers = _http_post(
                        base + "/style", img.tobytes(),
                        {**hdr, "X-Style": style},
                    )
                    assert code == 200
                    from PIL import Image

                    outs[style] = np.asarray(Image.open(io.BytesIO(png)))
                assert not np.array_equal(outs["warm"], outs["cool"])

                code, png, _ = _http_post(
                    base + "/style", img.tobytes(),
                    {**hdr, "X-Style": "warm:0.5,cool:0.5"},
                )
                assert code == 200
                blend = np.asarray(Image.open(io.BytesIO(png)))
                assert not np.array_equal(blend, outs["warm"])
                assert not np.array_equal(blend, outs["cool"])

                for bad in ("nosuch", "warm:abc", "warm:-1", ":0.5"):
                    code, _, _ = _http_post(
                        base + "/style", img.tobytes(),
                        {**hdr, "X-Style": bad},
                    )
                    assert code == 400, bad
                code, _ = _http_get(base + "/healthz")
                assert code == 200
            finally:
                srv.shutdown()


class TestServeStyleCLI:
    def test_cli_end_to_end_family2(self, tiny_imagefolder, tmp_path):
        """Train a tiny family-2 model, start the serve_style CLI stack
        programmatically, POST an image, get a stylised PNG back."""
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            build_parser,
            start,
        )
        from heuristique_style_transfer_code_tpu.cli.train_gram_attention import (
            main as train_main,
        )

        cfg_path = str(tmp_path / "f2.json")
        with open(cfg_path, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "gram_matrix_size": 4, "num_classes": 4, "seed": 0}, f)
        models = str(tmp_path / "m")
        train_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_path,
            "--epochs", "1", "--k_folds", "2", "--save_dir", models,
            "--seed", "0",
        ])
        args = build_parser().parse_args([
            "--family", "gram_attention", "--config_path", cfg_path,
            "--model_path", os.path.join(models, "best_global_model.npz"),
            "--port", "0", "--batch_size", "2", "--num_iterations", "3",
            "--layers", "5", "--no_warmup",
        ])
        srv, svc = start(args, crop=64)
        host, port = srv.server_address[:2]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            img = np.random.RandomState(9).randint(
                0, 256, (64, 64, 3), np.uint8
            )
            code, png, headers = _http_post(
                f"http://{host}:{port}/style", img.tobytes(),
                {"X-Raw-Shape": "64,64,3"},
            )
            assert code == 200
            from PIL import Image

            out = np.asarray(Image.open(io.BytesIO(png)))
            assert out.shape == (64, 64, 3)
            assert int(headers["X-Iterations"]) == 3
        finally:
            srv.shutdown()
            svc.stop()

    def test_cli_style_gallery(self, tiny_imagefolder, tmp_path):
        """--style_image twice -> content+style server with a 2-style
        gallery; X-Style picks, /styles lists."""
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            build_parser,
            start,
        )
        from heuristique_style_transfer_code_tpu.cli.train_gram_attention import (
            main as train_main,
        )
        from PIL import Image

        cfg_path = str(tmp_path / "f2.json")
        with open(cfg_path, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "gram_matrix_size": 4, "num_classes": 4, "seed": 0}, f)
        models = str(tmp_path / "m")
        train_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_path,
            "--epochs", "1", "--k_folds", "2", "--save_dir", models,
            "--seed", "0",
        ])
        rng = np.random.RandomState(18)
        for name in ("vangogh", "monet"):
            Image.fromarray(
                rng.randint(0, 256, (80, 96, 3), np.uint8)
            ).save(str(tmp_path / f"{name}.png"))
        args = build_parser().parse_args([
            "--family", "gram_attention", "--config_path", cfg_path,
            "--model_path", os.path.join(models, "best_global_model.npz"),
            "--port", "0", "--batch_size", "2", "--num_iterations", "3",
            "--layers", "5", "--no_warmup",
            "--style_image", str(tmp_path / "vangogh.png"),
            "--style_image", "claude=" + str(tmp_path / "monet.png"),
            "--content_weight", "0.5", "--tv_weight", "0.1",
        ])
        srv, svc = start(args, crop=64)
        host, port = srv.server_address[:2]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            base = f"http://{host}:{port}"
            code, body = _http_get(base + "/styles")
            assert json.loads(body) == {"styles": ["vangogh", "claude"]}
            img = np.random.RandomState(19).randint(
                0, 256, (64, 64, 3), np.uint8
            )
            code, png, headers = _http_post(
                base + "/style", img.tobytes(),
                {"X-Raw-Shape": "64,64,3", "X-Style": "claude"},
            )
            assert code == 200
            out = np.asarray(Image.open(io.BytesIO(png)))
            assert out.shape == (64, 64, 3)
        finally:
            srv.shutdown()
            svc.stop()

    def test_cli_artifact_export_and_serve(self, tiny_imagefolder, tmp_path):
        """--export_artifact writes the AOT job program; --artifact serves
        it with NO --config_path/--model_path/--style_image — gallery and
        X-Style picks come from the artifact."""
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            build_parser,
            main,
            start,
        )
        from heuristique_style_transfer_code_tpu.cli.train_gram_attention import (
            main as train_main,
        )
        from PIL import Image

        cfg_path = str(tmp_path / "f2.json")
        with open(cfg_path, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "gram_matrix_size": 4, "num_classes": 4, "seed": 0}, f)
        models = str(tmp_path / "m")
        train_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_path,
            "--epochs", "1", "--k_folds", "2", "--save_dir", models,
            "--seed", "0",
        ])
        rng = np.random.RandomState(20)
        Image.fromarray(
            rng.randint(0, 256, (80, 96, 3), np.uint8)
        ).save(str(tmp_path / "vangogh.png"))
        art_path = str(tmp_path / "style_artifact.npz")
        main([
            "--family", "gram_attention", "--config_path", cfg_path,
            "--model_path", os.path.join(models, "best_global_model.npz"),
            "--batch_size", "2", "--num_iterations", "3", "--layers", "5",
            "--style_image", str(tmp_path / "vangogh.png"),
            "--export_artifact", art_path,
        ])
        assert os.path.exists(art_path)

        args = build_parser().parse_args([
            "--artifact", art_path, "--port", "0",
        ])
        srv, svc = start(args)
        host, port = srv.server_address[:2]
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        try:
            base = f"http://{host}:{port}"
            code, body = _http_get(base + "/styles")
            assert json.loads(body) == {"styles": ["vangogh"]}
            img = np.random.RandomState(21).randint(
                0, 256, (224, 224, 3), np.uint8
            )
            code, png, headers = _http_post(
                base + "/style", img.tobytes(),
                {"X-Raw-Shape": "224,224,3", "X-Style": "vangogh"},
            )
            assert code == 200
            assert int(headers["X-Iterations"]) == 3
            out = np.asarray(Image.open(io.BytesIO(png)))
            assert out.shape == (224, 224, 3)
        finally:
            srv.shutdown()
            svc.stop()

    def test_cli_missing_model_args_rejected(self):
        from heuristique_style_transfer_code_tpu.cli.serve_style import main

        with pytest.raises(SystemExit):
            main(["--port", "0", "--max_seconds", "1"])


class TestMultiSizeArtifact:
    def test_multi_size_aot_round_trip(self, tmp_path):
        """A multi-size service exports its whole dispatch ladder (one
        StableHLO program per compiled size); a service over the loaded
        artifact picks the SAME dispatch sizes as live serving — a lone job
        rides the small program, a burst the big one — and returns the same
        results (allclose, the artifact contract)."""
        from heuristique_style_transfer_code_tpu.deploy.artifact import (
            export_style_artifact,
            load_style_artifact,
            save_style_artifact,
        )

        imgs = _images(4, seed=41)
        live = _cs_service(batch_size=(2, 4))
        blobs, meta = export_style_artifact(live)
        assert meta["batch_sizes"] == [2, 4] and sorted(blobs) == [2, 4]
        path = str(tmp_path / "style_ladder.npz")
        save_style_artifact(path, blobs, meta)

        def drive(svc):
            with svc:
                lone = svc.submit(imgs[0]).result(timeout=120)
                futs = [svc.submit(im) for im in imgs]
                burst = [f.result(timeout=120) for f in futs]
                hist = svc.stats()["batch_size_hist"]
            return lone, burst, hist

        r_live = drive(live)
        art = load_style_artifact(path)
        r_art = drive(StyleTransferService(
            job_fn=art.job_fns, style_names=art.meta["style_names"],
            crop=art.meta["crop"],
            num_iterations=art.meta["num_iterations"],
            max_delay_ms=150.0,
        ))
        # dispatch-size selection parity: both services used the small AND
        # the big program
        for hist in (r_live[2], r_art[2]):
            assert hist.get("2", 0) >= 1, hist
            assert hist.get("4", 0) >= 1, hist
        assert r_live[0].iterations == r_art[0].iterations
        np.testing.assert_allclose(
            r_live[0].image.astype(np.int32),
            r_art[0].image.astype(np.int32), atol=1,
        )
        for a, b in zip(r_live[1], r_art[1]):
            assert a.iterations == b.iterations
            np.testing.assert_allclose(
                a.image.astype(np.int32), b.image.astype(np.int32), atol=1,
            )

    def test_single_size_v1_file_still_loads(self, tmp_path):
        """Format-v1 files (one 'stablehlo' entry) keep loading: the r3
        export path wrote them via save_infer_artifact."""
        import numpy as _np
        import json as _json

        from heuristique_style_transfer_code_tpu.deploy.artifact import (
            export_style_artifact,
            load_style_artifact,
        )

        live = _cs_service()
        blobs, meta = export_style_artifact(live)
        (blob,) = blobs.values()
        meta_v1 = {k: v for k, v in meta.items() if k != "batch_sizes"}
        path = str(tmp_path / "v1.npz")
        with open(path, "wb") as f:
            _np.savez(
                f,
                stablehlo=_np.frombuffer(blob, dtype=_np.uint8),
                meta=_np.asarray(_json.dumps(meta_v1)),
            )
        art = load_style_artifact(path)
        assert sorted(art.job_fns) == [4]
        img = _images(1, seed=42)[0]
        with StyleTransferService(
            job_fn=art.job_fns, style_names=art.meta["style_names"],
            crop=art.meta["crop"],
            num_iterations=art.meta["num_iterations"],
        ) as svc:
            r = svc.submit(img).result(timeout=120)
        assert r.image.shape == (CROP, CROP, 3)


class TestYuvTransport:
    """transport='yuv420': planar I420 uint8 BOTH ways — half the pixel
    bytes through a bandwidth-bound link (the net-soak's measured
    constraint); client API stays RGB."""

    def _smooth(self, seed=0):
        # smooth content: 4:2:0 chroma loss is small where chroma is smooth
        rng = np.random.RandomState(seed)
        base = rng.rand(4, 4, 3).astype(np.float32)
        up = jax.image.resize(jnp.asarray(base), (CROP, CROP, 3), "linear")
        return np.asarray(jnp.round(jnp.clip(up, 0, 1) * 255)).astype(np.uint8)

    def _net_service(self, transport):
        from heuristique_style_transfer_code_tpu.nn.transformer_net import (
            transformer_net_init,
        )
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_net_job_fn,
        )

        params = transformer_net_init(jax.random.PRNGKey(5), width=4, n_res=1)
        return StyleTransferService(
            job_fn={2: make_net_job_fn(params, crop=CROP)},
            style_names=["s"], crop=CROP, max_delay_ms=30.0,
            num_iterations=1, transport=transport,
        )

    def test_transport_round_trip_close(self):
        """Identity job: the result is the input after host-pack -> device
        unpack -> device repack -> host unpack. On smooth content the two
        4:2:0 chroma subsamplings cost a few counts — the transport's own
        loss, isolated from any model's input sensitivity."""
        img = self._smooth()

        def identity_job(images_u8, style_w, job_ids):
            del style_w
            return (
                images_u8, jnp.asarray(1),
                jnp.zeros((images_u8.shape[0],), jnp.float32),
            )

        with StyleTransferService(
            job_fn={2: identity_job}, style_names=["s"], crop=CROP,
            max_delay_ms=30.0, num_iterations=1, transport="yuv420",
        ) as svc:
            r = svc.submit(img).result(timeout=120)
        assert r.image.shape == (CROP, CROP, 3) and r.image.dtype == np.uint8
        diff = np.abs(r.image.astype(np.int32) - img.astype(np.int32))
        # floor: cv2's own I420 encode->decode round trip (the unavoidable
        # 4:2:0 + studio-swing loss). The service pipeline (host pack ->
        # device unpack -> device repack -> host unpack) must add
        # essentially nothing on top (measured: +0.01 mean counts)
        import cv2

        from heuristique_style_transfer_code_tpu.tasks.camera import (
            rgb_to_yuv420,
        )

        floor = np.abs(
            cv2.cvtColor(rgb_to_yuv420(img), cv2.COLOR_YUV2RGB_I420)
            .astype(np.int32) - img.astype(np.int32)
        )
        assert diff.mean() <= floor.mean() * 1.2 + 1.0, (
            diff.mean(), floor.mean()
        )

    def test_iterative_texture_mode_yuv(self):
        img = self._smooth(seed=1)
        with _service(transport="yuv420") as svc:
            r = svc.submit(img).result(timeout=120)
        assert r.image.shape == (CROP, CROP, 3) and np.isfinite(r.loss)

    def test_yuv_deterministic(self):
        img = self._smooth(seed=2)
        outs = []
        for _ in range(2):
            with self._net_service("yuv420") as svc:
                outs.append(svc.submit(img).result(timeout=120).image)
        np.testing.assert_array_equal(outs[0], outs[1])

    def test_validation(self):
        with pytest.raises(ValueError, match="transport"):
            _service(transport="avif")
        with pytest.raises(ValueError, match="crop"):
            _service(transport="yuv420", crop=18)

    def test_warmup_compiles_yuv_shapes(self):
        svc = self._net_service("yuv420")
        svc.warmup()
        svc.start()
        try:
            r = svc.submit(self._smooth(3)).result(timeout=120)
            assert r.image.shape == (CROP, CROP, 3)
        finally:
            svc.stop()

    def test_cli_flag(self, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            build_parser,
        )

        args = build_parser().parse_args(["--transport", "yuv420"])
        assert args.transport == "yuv420"


class TestYuvExportInteraction:
    def test_export_is_transport_independent(self, tmp_path):
        """A yuv420-serving service exports the same RGB artifact as an rgb
        one (transport is serve-time), and the artifact serves under BOTH
        transports with close results."""
        from heuristique_style_transfer_code_tpu.deploy.artifact import (
            export_style_artifact,
            load_style_artifact,
            save_style_artifact,
        )

        rng = np.random.RandomState(9)
        base = rng.rand(4, 4, 3).astype(np.float32)
        img = np.asarray(
            jnp.round(jnp.clip(
                jax.image.resize(jnp.asarray(base), (CROP, CROP, 3),
                                 "linear"), 0, 1) * 255)
        ).astype(np.uint8)

        yuv_svc = _cs_service(transport="yuv420", num_iterations=5)
        blobs_yuv, meta_yuv = export_style_artifact(yuv_svc)
        rgb_svc = _cs_service(num_iterations=5)
        blobs_rgb, _ = export_style_artifact(rgb_svc)
        # same ladder from both services; byte equality is NOT asserted —
        # jax.export serialises the first program in a process a few bytes
        # smaller than later identical ones, so blob sizes are
        # order-dependent. Transport independence is proven below by
        # SERVING the yuv-exported artifact under both transports.
        assert sorted(blobs_yuv) == sorted(blobs_rgb)

        path = str(tmp_path / "a.npz")
        save_style_artifact(path, blobs_yuv, meta_yuv)
        art = load_style_artifact(path)
        results = {}
        for transport in ("rgb", "yuv420"):
            with StyleTransferService(
                job_fn=art.job_fns, style_names=art.meta["style_names"],
                crop=art.meta["crop"],
                num_iterations=art.meta["num_iterations"],
                max_delay_ms=100.0, transport=transport,
            ) as svc:
                results[transport] = svc.submit(
                    img, style="warm"
                ).result(timeout=120)
        a, b = results["rgb"], results["yuv420"]
        assert a.image.shape == b.image.shape == (CROP, CROP, 3)
        assert a.iterations == b.iterations
        # yuv is lossy; on smooth content the two paths stay close
        assert np.abs(
            a.image.astype(np.int32) - b.image.astype(np.int32)
        ).mean() < 25.0


def test_yuv_decode_failure_resolves_futures_and_service_survives(monkeypatch):
    """A host-side I420 decode failure must resolve that batch's futures
    with the exception (not kill the fetcher thread and wedge the service)
    — the decode sits inside the fetch-loop's error handling (review
    finding r4)."""
    import cv2

    def identity_job(images_u8, style_w, job_ids):
        del style_w
        return (
            images_u8, jnp.asarray(1),
            jnp.zeros((images_u8.shape[0],), jnp.float32),
        )

    svc = StyleTransferService(
        job_fn={2: identity_job}, style_names=["s"], crop=CROP,
        max_delay_ms=30.0, num_iterations=1, transport="yuv420",
    ).start()
    try:
        real = cv2.cvtColor
        state = {"fail": True}

        def flaky(*a, **k):
            if state["fail"]:
                raise RuntimeError("synthetic decode failure")
            return real(*a, **k)

        monkeypatch.setattr(cv2, "cvtColor", flaky)
        img = _images(1, seed=60)[0]
        with pytest.raises(RuntimeError, match="synthetic decode"):
            svc.submit(img).result(timeout=60)
        # the fetcher thread survived: the next job succeeds
        state["fail"] = False
        r = svc.submit(img).result(timeout=60)
        assert r.image.shape == (CROP, CROP, 3)
    finally:
        monkeypatch.undo()
        svc.stop()
