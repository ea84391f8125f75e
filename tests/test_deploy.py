"""AOT serving artifacts (deploy/artifact.py): export → file → load →
bit-identical serving, including through the batching server and the CLI.

TPU-native deployment counterpart of the reference's .pth + model-class
flow (functions/functions_RESNET50_Truncate.py load_model): one StableHLO
file carries the fused program AND the weights.
"""
import http.client
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.deploy import (
    export_infer_artifact,
    load_infer_artifact,
    save_infer_artifact,
)
from heuristique_style_transfer_code_tpu.tasks.camera import (
    make_camera_infer_fn,
    make_camera_infer_fn_yuv,
)

from tests.linear_serving import (
    CLASSES,
    CROP,
    linear_forward as _forward,
    linear_variables as _variables,
    rgb_batch as _rgb_batch,
)


class TestArtifactRoundTrip:
    def test_symbolic_batch_exact(self, tmp_path):
        """One artifact, every batch size — exported weights baked in, the
        loaded program matches the live fused pipeline bit-for-bit."""
        variables = _variables()
        blob, meta = export_infer_artifact(
            _forward, variables, crop=CROP, class_names=list("abcd")
        )
        path = str(tmp_path / "model.hstart.npz")
        save_infer_artifact(path, blob, meta)
        art = load_infer_artifact(path)
        assert art.meta["batch_size"] is None
        assert art.meta["class_names"] == list("abcd")
        assert art.meta["num_outputs"] == CLASSES
        for n, seed in ((2, 1), (5, 2)):
            batch = _rgb_batch(n, seed)
            ref = make_camera_infer_fn(_forward, batch=n, host_downscale=True)(
                variables, jnp.asarray(batch)
            )
            np.testing.assert_array_equal(
                np.asarray(art(jnp.asarray(batch))), np.asarray(ref)
            )

    def test_static_batch_pins_shape(self, tmp_path):
        blob, meta = export_infer_artifact(
            _forward, _variables(), crop=CROP, batch_size=3
        )
        assert meta["input_shape"] == [3, CROP, CROP, 3]
        path = str(tmp_path / "static.npz")
        save_infer_artifact(path, blob, meta)
        art = load_infer_artifact(path)
        assert art(jnp.asarray(_rgb_batch(3))).shape == (3, CLASSES)
        with pytest.raises(Exception):  # wrong batch: sealed program refuses
            art(jnp.asarray(_rgb_batch(4)))

    def test_yuv420_transport(self, tmp_path):
        variables = _variables()
        blob, meta = export_infer_artifact(
            _forward, variables, crop=CROP, transport="yuv420"
        )
        assert meta["input_shape"] == ["b", CROP * 3 // 2, CROP]
        path = str(tmp_path / "yuv.npz")
        save_infer_artifact(path, blob, meta)
        art = load_infer_artifact(path)
        yuv = np.random.RandomState(3).randint(
            0, 256, (3, CROP * 3 // 2, CROP), dtype=np.uint8
        )
        ref = make_camera_infer_fn_yuv(_forward, CROP, batch=3)(
            variables, jnp.asarray(yuv)
        )
        np.testing.assert_array_equal(
            np.asarray(art(jnp.asarray(yuv))), np.asarray(ref)
        )

    def test_multi_platform_lowering(self, tmp_path):
        """A ('tpu', 'cpu') artifact lowers from a CPU-only process and still
        executes on CPU — the deploy-on-TPU / smoke-on-CPU story."""
        blob, meta = export_infer_artifact(
            _forward, _variables(), crop=CROP, platforms=("tpu", "cpu")
        )
        assert meta["platforms"] == ["tpu", "cpu"]
        path = str(tmp_path / "mp.npz")
        save_infer_artifact(path, blob, meta)
        probs = np.asarray(load_infer_artifact(path)(jnp.asarray(_rgb_batch(2))))
        np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)

    def test_mesh_sharded_artifact(self, tmp_path):
        """SPMD export: the artifact carries the batch sharding over the
        8-device mesh and matches the single-device program."""
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            batch_sharding,
            make_mesh_2d,
        )

        variables = _variables()
        mesh = make_mesh_2d(8)
        blob, meta = export_infer_artifact(
            _forward, variables, crop=CROP, batch_size=16, mesh=mesh
        )
        assert meta["n_devices"] == 8
        path = str(tmp_path / "spmd.npz")
        save_infer_artifact(path, blob, meta)
        art = load_infer_artifact(path)
        batch = _rgb_batch(16, seed=5)
        got = art(jax.device_put(jnp.asarray(batch), batch_sharding(mesh)))
        ref = make_camera_infer_fn(_forward, batch=16, host_downscale=True)(
            variables, jnp.asarray(batch)
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-7
        )

    def test_mesh_requires_concrete_batch(self):
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_2d,
        )

        with pytest.raises(ValueError, match="concrete batch_size"):
            export_infer_artifact(
                _forward, _variables(), crop=CROP, mesh=make_mesh_2d(8)
            )

    def test_load_rejects_foreign_file(self, tmp_path):
        path = str(tmp_path / "not_art.npz")
        np.savez(path, x=np.zeros(3))
        with pytest.raises((ValueError, KeyError)):
            load_infer_artifact(path)

    def test_family1_resnet_artifact(self, tmp_path):
        """Real flagship model: the exported truncate-5 combined forward
        equals the live path exactly, through the file."""
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, 5, dim=16),
            "classifier": classifier_init(k2, 16, CLASSES),
        }

        def forward_eval(v, images):
            return combined_apply(v["moco"], v["classifier"], images, 5)[0]

        blob, meta = export_infer_artifact(forward_eval, variables, crop=CROP)
        path = str(tmp_path / "f1.npz")
        save_infer_artifact(path, blob, meta)
        art = load_infer_artifact(path)
        batch = _rgb_batch(2, seed=7)
        ref = make_camera_infer_fn(forward_eval, batch=2, host_downscale=True)(
            variables, jnp.asarray(batch)
        )
        # not bit-exact: the deserialized StableHLO module is a different
        # program to XLA (one sealed call op), so fusion choices can differ
        # by a ULP on a 50-layer net — observed max 3e-8 abs
        np.testing.assert_allclose(
            np.asarray(art(jnp.asarray(batch))), np.asarray(ref),
            rtol=1e-6, atol=1e-7,
        )


class TestInt8Artifact:
    def test_int8_ptq_exports_identically(self, tmp_path):
        """The PTQ path (int8 weights + calibrated scales, requant fused)
        exports like any other program: the artifact closes over the
        quantised tree and matches the live int8 forward."""
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply_int8,
            prepare_combined_int8,
            truncated_moco_init,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, 5, dim=16),
            "classifier": classifier_init(k2, 16, CLASSES),
        }
        rng = np.random.RandomState(1)
        calib = [rng.randn(4, CROP, CROP, 3).astype(np.float32) for _ in range(2)]
        q_encoder = prepare_combined_int8(variables["moco"], 5, calib)

        def forward_eval(_v, images):  # quantised tree closed over
            return combined_apply_int8(
                q_encoder, variables["moco"], variables["classifier"], images
            )[0]

        blob, meta = export_infer_artifact(
            forward_eval, None, crop=CROP, extra_meta={"precision": "int8"}
        )
        path = str(tmp_path / "int8.npz")
        save_infer_artifact(path, blob, meta)
        art = load_infer_artifact(path)
        assert art.meta["precision"] == "int8"
        batch = _rgb_batch(2, seed=11)
        ref = make_camera_infer_fn(forward_eval, batch=2, host_downscale=True)(
            None, jnp.asarray(batch)
        )
        np.testing.assert_allclose(
            np.asarray(art(jnp.asarray(batch))), np.asarray(ref),
            rtol=1e-6, atol=1e-7,
        )


class TestArtifactServing:
    def test_server_from_artifact_matches_model_server(self):
        """BatchingInferenceServer(infer_fn=artifact) resolves the same
        probabilities as the model-backed server."""
        from heuristique_style_transfer_code_tpu.tasks.serving import (
            BatchingInferenceServer,
        )

        variables = _variables()
        blob, meta = export_infer_artifact(_forward, variables, crop=CROP)
        # in-memory load (no temp file needed for this test)
        from jax import export as jexport

        from heuristique_style_transfer_code_tpu.deploy.artifact import (
            InferenceArtifact,
        )

        artifact = InferenceArtifact(jexport.deserialize(bytearray(blob)), meta)
        frames = [f for f in _rgb_batch(6, seed=9)]

        def run(server):
            with server:
                futs = [server.submit(f) for f in frames]
                return np.stack([f.result(timeout=60) for f in futs])

        got = run(
            BatchingInferenceServer(
                None, None, batch_size=4, max_delay_ms=20, crop=CROP,
                infer_fn=artifact.server_infer_fn(),
            )
        )
        ref = run(
            BatchingInferenceServer(
                _forward, variables, batch_size=4, max_delay_ms=20, crop=CROP
            )
        )
        np.testing.assert_array_equal(got, ref)

    def test_mesh_sharded_artifact_through_batcher(self, tmp_path):
        """A mesh-exported (SPMD) artifact serves through the batching
        server when the batcher ships batch-sharded inputs — the wiring
        cli/serve.py rebuilds from exported.nr_devices. Guards the
        review-found failure where the batcher fed a multi-device program
        single-device host batches."""
        from heuristique_style_transfer_code_tpu.core.mesh import create_mesh
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_2d,
        )
        from heuristique_style_transfer_code_tpu.tasks.serving import (
            BatchingInferenceServer,
        )

        variables = _variables()
        for batch_size, mesh in (
            (16, make_mesh_2d(8, model_parallel=1)),  # batch divides: P('data')
            (4, make_mesh_2d(8)),  # (4×2) export served on a 1-D mesh:
            # batch 4 doesn't divide 8 — the batcher falls back to
            # replicated placement and the sealed sharding takes over
        ):
            blob, meta = export_infer_artifact(
                _forward, variables, crop=CROP, batch_size=batch_size, mesh=mesh
            )
            path = str(tmp_path / f"spmd_srv_{batch_size}.npz")
            save_infer_artifact(path, blob, meta)
            art = load_infer_artifact(path)
            assert int(art.exported.nr_devices) == 8

            frames = [f for f in _rgb_batch(2 * batch_size, seed=13)]
            with BatchingInferenceServer(
                None, None, batch_size=batch_size, max_delay_ms=20, crop=CROP,
                mesh=create_mesh(8), infer_fn=art.server_infer_fn(),
            ) as server:
                futs = [server.submit(f) for f in frames]
                got = np.stack([f.result(timeout=120) for f in futs])
            ref = make_camera_infer_fn(
                _forward, batch=batch_size, host_downscale=True
            )
            expect = np.concatenate([
                np.asarray(ref(
                    variables,
                    jnp.asarray(np.stack(frames[i: i + batch_size])),
                ))
                for i in (0, batch_size)
            ])
            np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


class TestArtifactCLI:
    def test_export_then_serve(self, tmp_path):
        """serve CLI --export_artifact writes the file; --artifact serves it
        over HTTP with classes from the artifact metadata."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.serve import (
            build_parser,
            export_artifact,
            start,
        )
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            truncated_moco_init,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        tree = {
            "moco": truncated_moco_init(k1, 5, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }
        ckpt = str(tmp_path / "model.npz")
        save_pytree_npz(tree, ckpt)
        cfg = str(tmp_path / "cfg.json")
        with open(cfg, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "seed": 0, "dim": 16}, f)
        art_path = str(tmp_path / "deploy.npz")

        export_artifact(build_parser().parse_args([
            "--config_path", cfg, "--model_path", ckpt,
            "--export_artifact", art_path, "--classes",
            "fog", "rain", "snow", "sun",
        ]))

        args = build_parser().parse_args([
            "--artifact", art_path, "--port", "0", "--batch_size", "2",
            "--max_delay_ms", "5",
        ])
        srv, batcher = start(args)
        try:
            host, port = srv.server_address
            conn = http.client.HTTPConnection(host, port, timeout=300)
            frame = np.random.RandomState(2).randint(
                0, 256, (224, 224, 3), dtype=np.uint8
            )
            conn.request(
                "POST", "/predict", body=frame.tobytes(),
                headers={"X-Raw-Shape": "224,224,3"},
            )
            r = conn.getresponse()
            assert r.status == 200
            out = json.loads(r.read())
            assert out["class"] in ["fog", "rain", "snow", "sun"]
            np.testing.assert_allclose(sum(out["probs"]), 1.0, rtol=1e-4)
        finally:
            srv.shutdown()
            batcher.stop(drain=True)

    def test_export_devices_semantics(self, tmp_path):
        """--devices 1 is the ordinary unsharded export (symbolic batch OK);
        a device count that doesn't divide --export_batch errors instead of
        silently sealing a smaller mesh into the artifact."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.serve import (
            build_parser,
            export_artifact,
        )
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            truncated_moco_init,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        ckpt = str(tmp_path / "model.npz")
        save_pytree_npz({
            "moco": truncated_moco_init(k1, 5, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }, ckpt)
        cfg = str(tmp_path / "cfg.json")
        with open(cfg, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "seed": 0, "dim": 16}, f)
        base = ["--config_path", cfg, "--model_path", ckpt,
                "--classes", "fog", "rain", "snow", "sun"]

        # --devices 1 + symbolic batch: plain unsharded export, no error
        p1 = str(tmp_path / "d1.npz")
        export_artifact(build_parser().parse_args(
            base + ["--export_artifact", p1, "--devices", "1"]
        ))
        assert load_infer_artifact(p1).meta["n_devices"] == 1

        # non-dividing device count: hard error, nothing written
        with pytest.raises(ValueError, match="not divisible"):
            export_artifact(build_parser().parse_args(
                base + ["--export_artifact", str(tmp_path / "bad.npz"),
                        "--devices", "8", "--export_batch", "12"]
            ))
        assert not os.path.exists(str(tmp_path / "bad.npz"))

    def test_export_families_2_and_3(self, tmp_path):
        """Every family the serve CLI can build exports: gram+attention and
        the multi-scale PatchGAN both round-trip through the artifact."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.serve import (
            build_parser,
            export_artifact,
        )
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from heuristique_style_transfer_code_tpu.models.multi_patchgan import (
            multiscale_init,
        )

        cfg2 = str(tmp_path / "f2.json")
        with open(cfg2, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "gram_matrix_size": 4, "num_classes": 4, "seed": 0}, f)
        ck2 = str(tmp_path / "f2.npz")
        save_pytree_npz(gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4), ck2)

        patch_sizes = {"small": 10, "medium": 16, "large": 20}
        cfg3 = str(tmp_path / "f3.json")
        with open(cfg3, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "seed": 0,
                       "num_classes": 4, "patch_sizes": patch_sizes,
                       "ndf": 16, "norm": "instance"}, f)
        ck3 = str(tmp_path / "f3.npz")
        save_pytree_npz(
            multiscale_init(jax.random.PRNGKey(1), patch_sizes, ndf=16,
                            num_classes=4, norm="instance"), ck3,
        )

        for family, cfg, ck in (
            ("gram_attention", cfg2, ck2),
            ("multi_patchgan", cfg3, ck3),
        ):
            path = str(tmp_path / f"{family}.art.npz")
            export_artifact(build_parser().parse_args([
                "--family", family, "--config_path", cfg,
                "--model_path", ck, "--export_artifact", path,
            ]))
            art = load_infer_artifact(path)
            assert art.meta["family"] == family
            probs = np.asarray(art(jnp.asarray(
                np.random.RandomState(3).randint(
                    0, 256, (2, 224, 224, 3), dtype=np.uint8
                )
            )))
            np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)

    def test_artifact_rejects_precision_flag(self, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.serve import main

        with pytest.raises(ValueError, match="baked into the artifact"):
            main(["--artifact", str(tmp_path / "x.npz"), "--precision", "bf16"])
