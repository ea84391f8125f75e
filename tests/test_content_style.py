"""Classic content+style transfer (beyond parity — the reference's loop is
texture-from-self only): tasks/style_transfer.make_content_style_optimizer,
the family-2 task wrapper and its CLI flag.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc
from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
    make_content_style_optimizer,
    make_style_transfer_optimizer,
    total_variation,
)


def _identity_extract(images):
    # feats = pixels (content loss becomes pixel MSE); one pixel-Gram layer
    return images, [gram_matrix_nhwc(images)]


class TestOptimizer:
    def test_content_dominant_recovers_content(self):
        """style_weight=0 + identity features reduces the loop to Adam on
        MSE(pixels, content): it must walk noise to the content image."""
        key = jax.random.PRNGKey(0)
        content = jax.random.uniform(key, (2, 8, 8, 3), jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(1), content.shape)
        opt = make_content_style_optimizer(
            _identity_extract, style_weight=0.0, content_weight=1.0,
            learning_rate=0.05, num_iterations=600, threshold=1e-5,
        )
        grams = gram_matrix_nhwc(content)  # ignored at weight 0
        pixels, iters, per = opt(noise, [grams], content)
        assert float(per.max()) < 1e-5
        assert int(iters) < 600  # early stop fired
        np.testing.assert_allclose(
            np.asarray(pixels), np.asarray(content), atol=0.05
        )

    def test_style_only_equals_texture_loop(self):
        """content_weight=0 must reproduce the reference texture loop run on
        the same features: identical trajectory up to fusion-level drift."""
        key = jax.random.PRNGKey(2)
        style = jax.random.uniform(key, (2, 8, 8, 3), jnp.float32)
        noise = jax.random.normal(jax.random.PRNGKey(3), style.shape)
        grams = gram_matrix_nhwc(style)

        cs = make_content_style_optimizer(
            _identity_extract, style_weight=1.0, content_weight=0.0,
            learning_rate=0.05, num_iterations=30, threshold=0.0,
        )
        tex = make_style_transfer_optimizer(
            lambda imgs: [gram_matrix_nhwc(imgs)],
            learning_rate=0.05, num_iterations=30, threshold=0.0,
        )
        p1, i1, l1 = cs(noise, [grams], jnp.zeros_like(style))
        p2, i2, l2 = tex(noise, [grams])
        assert int(i1) == int(i2) == 30
        np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(p1), np.asarray(p2), atol=1e-5
        )

    def test_both_terms_pull(self):
        """With both weights on, the final loss must be below the initial
        loss and both terms finite (the loop optimises the sum)."""
        content = jax.random.uniform(jax.random.PRNGKey(4), (2, 8, 8, 3))
        style = jax.random.uniform(jax.random.PRNGKey(5), (2, 8, 8, 3))
        grams = gram_matrix_nhwc(style)
        opt = make_content_style_optimizer(
            _identity_extract, style_weight=1.0, content_weight=1.0,
            learning_rate=0.05, num_iterations=50, threshold=0.0,
        )
        pixels, _, per = opt(content, [grams], content)
        # initial per-image loss (at pixels == content): pure style term
        init = np.asarray(
            jnp.mean(
                jnp.square(gram_matrix_nhwc(content) - grams),
                axis=(1, 2),
            )
        )
        assert (np.asarray(per) < init).all()


def _two_layer_extract(images):
    half = images[:, ::2, ::2, :]
    return images, [gram_matrix_nhwc(images), gram_matrix_nhwc(half)]


class TestMultiLayerStyle:
    def test_loss_is_sum_over_layers(self):
        """With a 2-layer extract, the reported per-image loss after ONE
        iteration (= loss at the initial pixels, reference body order) must
        equal sw * (MSE_l1 + MSE_l2) + cw * content MSE, by hand."""
        key = jax.random.PRNGKey(8)
        style = jax.random.uniform(key, (2, 8, 8, 3), jnp.float32)
        content = jax.random.uniform(jax.random.PRNGKey(9), style.shape)
        pixels0 = jax.random.normal(jax.random.PRNGKey(10), style.shape)
        _, targets = _two_layer_extract(style)
        opt = make_content_style_optimizer(
            _two_layer_extract, style_weight=2.0, content_weight=0.5,
            learning_rate=0.05, num_iterations=1, threshold=0.0,
        )
        _, _, per = opt(pixels0, targets, content)
        _, grams0 = _two_layer_extract(pixels0)
        expect = 2.0 * sum(
            jnp.mean(jnp.square(g - t), axis=(1, 2))
            for g, t in zip(grams0, targets)
        ) + 0.5 * jnp.mean(jnp.square(pixels0 - content), axis=(1, 2, 3))
        np.testing.assert_allclose(
            np.asarray(per), np.asarray(expect), rtol=1e-5
        )

    def test_extract_fn_gram_attention_layers(self):
        """style_layers='all' at truncate 6 hooks one Gram per executed
        stage (layer1: 256ch, layer2: 512ch); 'last' is the single
        truncation-point Gram; invalid values are rejected."""
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_extract_fn_gram_attention,
        )

        variables = gram_attention_init(jax.random.PRNGKey(0), 6, 4, 4)
        images = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))

        feats_all, grams_all = make_extract_fn_gram_attention(
            variables, 6, layers=6, style_layers="all"
        )(images)
        assert [g.shape for g in grams_all] == [(2, 256, 256), (2, 512, 512)]

        feats_last, grams_last = make_extract_fn_gram_attention(
            variables, 6, layers=6, style_layers="last"
        )(images)
        assert len(grams_last) == 1
        assert grams_last[0].shape == (2, 512, 512)
        np.testing.assert_array_equal(
            np.asarray(feats_all), np.asarray(feats_last)
        )
        # the deepest 'all' Gram IS the truncation-point Gram
        np.testing.assert_allclose(
            np.asarray(grams_all[1]), np.asarray(grams_last[0]), rtol=1e-6
        )

        with pytest.raises(ValueError, match="style_layers"):
            make_extract_fn_gram_attention(variables, 6, style_layers="deep")


class TestStyleRemat:
    def test_remat_trajectories_equal(self):
        """remat=True checkpoints encoder bottlenecks inside the loop. The
        contract (measured while writing this test): the texture loop's
        standalone gradient is BITWISE equal to plain and its canvas drifts
        only 6e-5 after 6 Adam iterations; the multi-gram content+style
        gradient reassociates under remat fusion (~6e-7 relative), and
        Adam's sign dynamics amplify that chaotically on near-zero-gradient
        PIXELS (0.03 after 6 iterations) while the LOSS trajectory stays at
        2e-5 relative. So: texture asserts the canvas, content+style
        asserts the one-step gradient and the loss trajectory."""
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_extract_fn_gram_attention,
            make_gram_fn_gram_attention,
        )

        variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32
        )
        noise = jax.random.normal(jax.random.PRNGKey(2), images.shape)

        gf = {
            r: make_gram_fn_gram_attention(variables, 5, layers=5, remat=r)
            for r in (False, True)
        }
        targets = gf[False](images)
        outs = {}
        for r in (False, True):
            opt = make_style_transfer_optimizer(gf[r], 0.05, 6, 0.0)
            outs[r] = opt(noise, targets)
        assert int(outs[False][1]) == int(outs[True][1])
        np.testing.assert_allclose(
            np.asarray(outs[False][0]), np.asarray(outs[True][0]), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(outs[False][2]), np.asarray(outs[True][2]), rtol=1e-4
        )

        ef = {
            r: make_extract_fn_gram_attention(
                variables, 5, layers=5, style_layers="all", remat=r
            )
            for r in (False, True)
        }
        feats, grams = ef[False](images)

        def make_loss(fn):
            def loss_fn(n):
                f, g = fn(n)
                s = sum(
                    jnp.sum(jnp.square(a - b)) for a, b in zip(g, grams)
                )
                return s + 0.5 * jnp.sum(jnp.square(f - feats))

            return loss_fn

        g_plain = jax.jit(jax.grad(make_loss(ef[False])))(noise)
        g_remat = jax.jit(jax.grad(make_loss(ef[True])))(noise)
        scale = float(jnp.abs(g_plain).max())
        assert float(jnp.abs(g_plain - g_remat).max()) < 3e-6 * scale

        outs = {}
        for r in (False, True):
            opt = make_content_style_optimizer(
                ef[r], 1.0, 0.5, 0.05, 6, 0.0, tv_weight=0.1
            )
            outs[r] = opt(noise, grams, feats)
        np.testing.assert_allclose(
            np.asarray(outs[False][2]), np.asarray(outs[True][2]), rtol=1e-3
        )


class TestTotalVariation:
    def test_constant_image_is_zero(self):
        assert float(total_variation(jnp.ones((2, 5, 5, 3))).sum()) == 0.0

    def test_known_value(self):
        """A horizontal ramp x[h,w]=w: dw diffs all 1, dh diffs all 0."""
        img = jnp.broadcast_to(
            jnp.arange(4, dtype=jnp.float32).reshape(1, 1, 4, 1), (1, 3, 4, 2)
        )
        np.testing.assert_allclose(np.asarray(total_variation(img)), [1.0])

    def test_tv_weight_smooths_result(self):
        """With identity features, a strong TV term must yield a visibly
        smoother canvas than the same run without it (same everything else)."""
        content = jax.random.uniform(jax.random.PRNGKey(6), (2, 8, 8, 3))
        grams = gram_matrix_nhwc(content)
        outs = {}
        for tv in (0.0, 5.0):
            opt = make_content_style_optimizer(
                _identity_extract, style_weight=1.0, content_weight=1.0,
                learning_rate=0.05, num_iterations=80, threshold=0.0,
                tv_weight=tv,
            )
            pixels, _, _ = opt(
                jax.random.normal(jax.random.PRNGKey(7), content.shape),
                [grams], content,
            )
            outs[tv] = pixels
        tv0 = float(total_variation(outs[0.0]).mean())
        tv5 = float(total_variation(outs[5.0]).mean())
        assert tv5 < tv0
        # tv_weight=0 stays the exact no-TV program (loss graph unchanged)
        opt_plain = make_content_style_optimizer(
            _identity_extract, 1.0, 1.0, 0.05, 80, 0.0,
        )
        p_plain, _, _ = opt_plain(
            jax.random.normal(jax.random.PRNGKey(7), content.shape),
            [grams], content,
        )
        np.testing.assert_array_equal(np.asarray(outs[0.0]), np.asarray(p_plain))


class TestSharded:
    def test_batch_sharded_matches_single_device(self):
        """mesh= batch-shards the content+style optimisations over 'data';
        lanes are independent, so results must match single-device
        numerically (matmul tiling differs per shard width — tight rtol,
        not bit-equality)."""
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_2d,
        )

        key = jax.random.PRNGKey(20)
        style = jax.random.uniform(key, (8, 16, 16, 3), jnp.float32)
        content = jax.random.uniform(jax.random.PRNGKey(21), style.shape)
        noise0 = jax.random.normal(jax.random.PRNGKey(22), style.shape)
        _, targets = _identity_extract(style)

        single = make_content_style_optimizer(
            _identity_extract, 1.0, 0.5, 0.05, 40, 1e-4, tv_weight=0.1,
        )
        mesh = make_mesh_2d(8, model_parallel=1)
        sharded = make_content_style_optimizer(
            _identity_extract, 1.0, 0.5, 0.05, 40, 1e-4, tv_weight=0.1,
            mesh=mesh,
        )
        p_a, i_a, per_a = single(noise0, targets, content)
        p_b, i_b, per_b = sharded(noise0, targets, content)
        assert int(i_a) == int(i_b)
        np.testing.assert_allclose(
            np.asarray(per_a), np.asarray(per_b), rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-4)

    def test_spatial_sharded_matches_single_device(self):
        """A 'spatial' mesh axis shards each canvas's H rows (big-canvas
        path); a 3x3-conv extract exercises GSPMD halo exchanges in the
        forward AND the pixel-gradient transpose every iteration, and the
        TV term's H-adjacent differences add a second halo pattern."""
        from heuristique_style_transfer_code_tpu.ops.conv import (
            conv2d,
            conv2d_init,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_spatial,
        )

        conv = conv2d_init(jax.random.PRNGKey(23), 3, 8, 3)

        def extract(imgs):
            feats = conv2d(conv, imgs, stride=1, padding=1)
            return feats, [gram_matrix_nhwc(feats)]

        key = jax.random.PRNGKey(24)
        style = jax.random.uniform(key, (2, 16, 16, 3), jnp.float32)
        content = jax.random.uniform(jax.random.PRNGKey(25), style.shape)
        noise0 = jax.random.normal(jax.random.PRNGKey(26), style.shape)
        content_feats, targets = extract(style)

        single = make_content_style_optimizer(
            extract, 1.0, 0.5, 0.05, 40, 1e-4, tv_weight=0.1,
        )
        mesh = make_mesh_spatial(8, spatial=4)  # data=2 x spatial=4
        sharded = make_content_style_optimizer(
            extract, 1.0, 0.5, 0.05, 40, 1e-4, tv_weight=0.1, mesh=mesh,
        )
        p_a, i_a, per_a = single(noise0, targets, content_feats)
        p_b, i_b, per_b = sharded(noise0, targets, content_feats)
        assert int(i_a) == int(i_b)
        np.testing.assert_allclose(
            np.asarray(per_a), np.asarray(per_b), rtol=1e-4
        )
        np.testing.assert_allclose(np.asarray(p_a), np.asarray(p_b), atol=1e-4)


class TestTaskAndCLI:
    def test_task_writes_artifacts(self, tiny_imagefolder, tmp_path):
        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )
        from heuristique_style_transfer_code_tpu.data.loader import HostLoader
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            content_style_transfer_gram_attention,
        )

        variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples[:2], batch_size=2)
        style = np.random.RandomState(0).randint(
            0, 256, (256, 256, 3), np.uint8
        )
        saved = content_style_transfer_gram_attention(
            variables, loader, style, str(tmp_path),
            layers=5, truncate_layer=5, threshold=1e-3,
            num_iterations=5, learning_rate=0.05,
        )
        assert len(saved) == 2
        for p in saved:
            assert os.path.exists(p)
            assert "content_style_" in p

    def test_noise_init_differs_from_content_init(self, tiny_imagefolder,
                                                  tmp_path):
        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )
        from heuristique_style_transfer_code_tpu.data.loader import HostLoader
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            content_style_transfer_gram_attention,
        )
        import matplotlib.image as mpimg

        variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        style = np.random.RandomState(1).randint(
            0, 256, (256, 256, 3), np.uint8
        )
        outs = {}
        for init in ("content", "noise"):
            loader = HostLoader(idx.samples[:2], batch_size=2)
            saved = content_style_transfer_gram_attention(
                variables, loader, style, str(tmp_path / init),
                layers=5, truncate_layer=5, threshold=0.0,
                num_iterations=3, learning_rate=0.05, init=init,
            )
            outs[init] = mpimg.imread(saved[0])
        assert not np.allclose(outs["content"], outs["noise"])

    def test_invalid_init_rejected(self):
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            content_style_transfer_gram_attention,
        )

        variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)
        with pytest.raises(ValueError, match="init"):
            content_style_transfer_gram_attention(
                variables, [], np.zeros((256, 256, 3), np.uint8), "/tmp/x",
                init="zeros",
            )

    def test_cli_style_image_flag(self, tiny_imagefolder, tmp_path):
        """--style_image on the family-2 eval CLI drives the content+style
        path end-to-end from a saved checkpoint."""
        import json

        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.test_gram_attention import (
            main,
        )
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )
        from PIL import Image

        variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)
        ckpt = str(tmp_path / "model.npz")
        save_pytree_npz(variables, ckpt)
        cfg = str(tmp_path / "cfg.json")
        with open(cfg, "w") as f:
            json.dump({"batch_size": 2, "lr": 0.01, "truncate_layer": 5,
                       "gram_matrix_size": 4, "num_classes": 4, "seed": 0}, f)
        style_path = str(tmp_path / "style.png")
        Image.fromarray(
            np.random.RandomState(2).randint(0, 256, (80, 96, 3), np.uint8)
        ).save(style_path)
        out = str(tmp_path / "res")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg,
            "--model_path", ckpt, "--mode", "style_transfer",
            "--save_dir", out, "--layers", "5", "--num_iterations", "3",
            "--threshold", "1e-3", "--num_samples", "2", "--batch_size", "2",
            "--style_image", style_path, "--content_weight", "0.5",
            "--tv_weight", "0.05", "--style_layers", "all",
        ])
        st_dirs = [d for d in os.listdir(out) if d.startswith("style_transfer_")]
        assert st_dirs
        found = []
        for root, _, files in os.walk(out):
            found += [f for f in files if f.startswith("content_style_")]
        assert len(found) == 2


class TestWeightsInt8Loop:
    """weights_int8 on the style encoders (VERDICT r4 #7): conv kernels
    stored int8+scale, dequantised at use. The loop optimises pixels only,
    so the dequantised convs pass exact pixel gradients; the features (and
    hence targets) shift by the weight-rounding error, which is why the
    quantised loop always runs against its OWN targets."""

    def _vars(self):
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )

        return gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)

    def test_grams_close_to_f32(self):
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_gram_fn_gram_attention,
        )

        variables = self._vars()
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32
        )
        g_f32 = make_gram_fn_gram_attention(variables, 5, layers=5)(images)[0]
        g_q = make_gram_fn_gram_attention(
            variables, 5, layers=5, weights_int8=True
        )(images)[0]
        rel = float(
            jnp.linalg.norm(g_q - g_f32) / jnp.linalg.norm(g_f32)
        )
        assert rel < 0.1, rel  # per-channel int8 rounding only
        assert rel > 0.0  # actually quantised, not a passthrough

    def test_loop_converges_with_quantised_weights(self):
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_gram_fn_gram_attention,
        )

        variables = self._vars()
        gf_q = make_gram_fn_gram_attention(
            variables, 5, layers=5, weights_int8=True
        )
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32
        )
        noise = jax.random.normal(jax.random.PRNGKey(2), images.shape)
        targets = gf_q(images)

        def loss_at(n):
            per = [
                jnp.mean(jnp.square(g - t), axis=(1, 2))
                for g, t in zip(gf_q(n), targets)
            ]
            return np.asarray(sum(per))

        l0 = loss_at(noise)
        opt = make_style_transfer_optimizer(gf_q, 0.05, 8, 0.0)
        canvas, iters, per = opt(noise, targets)
        assert int(iters) == 8
        assert np.all(np.isfinite(np.asarray(canvas)))
        assert np.all(np.asarray(per) < l0), (np.asarray(per), l0)
        # pixel gradients flow through the dequantised convs
        assert float(jnp.abs(canvas - noise).max()) > 0

    def test_content_style_extract_quantised(self):
        from heuristique_style_transfer_code_tpu.tasks.style_transfer import (
            make_extract_fn_gram_attention,
        )

        variables = self._vars()
        ef_q = make_extract_fn_gram_attention(
            variables, 5, layers=5, style_layers="all", weights_int8=True
        )
        images = jax.random.uniform(
            jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32
        )
        noise = jax.random.normal(jax.random.PRNGKey(2), images.shape)
        feats, grams = ef_q(images)
        opt = make_content_style_optimizer(ef_q, 1.0, 0.5, 0.05, 5, 0.0)
        canvas, iters, per = opt(noise, grams, feats)
        assert int(iters) == 5
        assert np.all(np.isfinite(np.asarray(canvas)))
        assert np.all(np.isfinite(np.asarray(per)))
