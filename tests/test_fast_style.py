"""Feed-forward fast style transfer (beyond parity): nn/transformer_net.py,
tasks/fast_style.py, the hst-train-style-net CLI and serve_style --net."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.nn.transformer_net import (
    count_params,
    transformer_net_apply,
    transformer_net_init,
)
from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc
from heuristique_style_transfer_code_tpu.ops.resize import (
    IMAGENET_MEAN,
    IMAGENET_STD,
)


def _identity_extract(images):
    # feats = pixels, style layer = the pixel Gram: makes losses analytic
    return images, [gram_matrix_nhwc(images)]


class TestTransformerNet:
    def test_shapes_and_range(self):
        params = transformer_net_init(jax.random.PRNGKey(0), width=4, n_res=2)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        y = transformer_net_apply(params, x)
        assert y.shape == x.shape and y.dtype == jnp.float32
        # output denormalises into [0, 1] by construction (sigmoid head)
        y01 = np.asarray(y) * IMAGENET_STD + IMAGENET_MEAN
        assert y01.min() >= 0.0 and y01.max() <= 1.0

    def test_bf16_close_to_f32(self):
        params = transformer_net_init(jax.random.PRNGKey(0), width=4, n_res=1)
        x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 3))
        y32 = transformer_net_apply(params, x)
        y16 = transformer_net_apply(params, x, compute_dtype=jnp.bfloat16)
        # [0,1]-space agreement
        a = np.asarray(y32) * IMAGENET_STD + IMAGENET_MEAN
        b = np.asarray(y16) * IMAGENET_STD + IMAGENET_MEAN
        assert np.abs(a - b).max() < 0.05

    def test_param_count_classic_config(self):
        params = transformer_net_init(jax.random.PRNGKey(0))
        n = count_params(params)
        assert 1.5e6 < n < 2.0e6  # ~1.68 M, the Johnson-net scale

    def test_odd_size_rejected_by_cli_guard(self):
        from heuristique_style_transfer_code_tpu.cli.train_style_net import main

        with pytest.raises(SystemExit):
            main(["--data", "x", "--style_image", "y",
                  "--config_path", "c", "--model_path", "m", "--crop", "30"])


def _style_target():
    """Horizontal stripes: a pixel-Gram distinct from random content."""
    style01 = np.zeros((1, 8, 8, 3), np.float32)
    style01[:, ::2] = 1.0
    style = (style01 - IMAGENET_MEAN) / IMAGENET_STD
    return [gram_matrix_nhwc(jnp.asarray(style))]


class TestFastStyleTraining:
    def test_step_reduces_loss(self):
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_fast_style_train_step,
        )

        rng = np.random.RandomState(0)
        images_u8 = jnp.asarray(
            rng.randint(0, 256, (4, 12, 12, 3), dtype=np.uint8)
        )
        style_grams = _style_target()
        params = transformer_net_init(jax.random.PRNGKey(0), width=4, n_res=1)
        init_opt, step = make_fast_style_train_step(
            _identity_extract, style_weight=1.0, content_weight=0.1,
            learning_rate=5e-3, crop=8,
        )
        opt_state = init_opt(params)
        losses = []
        for _ in range(120):
            params, opt_state, loss = step(
                params, opt_state, images_u8, style_grams
            )
            losses.append(float(loss))
        assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

        # the trained net's output Gram is closer to the style target than
        # the content input's own Gram: it learned to impose the style
        from heuristique_style_transfer_code_tpu.data.augment import (
            eval_preprocess,
        )

        content = eval_preprocess(images_u8, 8)
        out = transformer_net_apply(params, content)
        t = style_grams[0]
        d_out = float(jnp.mean(jnp.square(gram_matrix_nhwc(out) - t)))
        d_in = float(jnp.mean(jnp.square(gram_matrix_nhwc(content) - t)))
        assert d_out < d_in

    def test_driver_and_mesh_equivalence(self):
        """train_fast_style over a fake loader; the batch-sharded step's
        first update equals single-device (DP grads all-reduce exactly)."""
        from heuristique_style_transfer_code_tpu.core.mesh import create_mesh
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_fast_style_train_step,
            train_fast_style,
        )

        rng = np.random.RandomState(1)
        batch = rng.randint(0, 256, (8, 12, 12, 3), dtype=np.uint8)
        loader = [(batch, None, None, None)] * 3

        def fresh_params():
            # the train step donates params/opt_state: every consumer below
            # needs its own buffers
            return transformer_net_init(jax.random.PRNGKey(1), width=4, n_res=1)

        style_u8 = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)

        params, history = train_fast_style(
            fresh_params(), _identity_extract, loader, style_u8,
            epochs=1, crop=8, learning_rate=1e-3, log_every=1,
            log_fn=lambda *_: None,
        )
        assert len(history) == 4  # 3 steps + final
        assert history[-1] <= history[0] * 1.5  # moved, sane

        style_grams = _style_target()
        outs = {}
        for mesh in (None, create_mesh(4)):
            init_opt, step = make_fast_style_train_step(
                _identity_extract, learning_rate=1e-3, crop=8, mesh=mesh
            )
            p = fresh_params()
            o = init_opt(p)
            losses = []
            for _ in range(3):
                p, o, loss = step(p, o, jnp.asarray(batch), style_grams)
                losses.append(float(loss))
            outs[mesh is None] = (jax.device_get(p), losses)
        p1, l1 = outs[True]
        p2, l2 = outs[False]
        # batch-sharding reorders the f32 loss-mean reduction (CLAUDE.md
        # numerics note). The LOSS trajectory stays tight; params drift by
        # up to ~lr per step where Adam's g/sqrt(g²) sign-normalisation
        # flips on near-zero gradients — bound, don't bit-compare.
        np.testing.assert_allclose(l1, l2, rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            # worst case: the runs take OPPOSITE unit Adam steps -> 2·lr/step
            assert np.abs(a - b).max() < 2 * 3 * 1e-3

    def test_npz_roundtrip(self, tmp_path):
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_stylize_fn,
        )

        params = transformer_net_init(jax.random.PRNGKey(2), width=4, n_res=2)
        path = str(tmp_path / "net.npz")
        save_pytree_npz(params, path)
        loaded = load_pytree_npz(path)
        u8 = jnp.asarray(
            np.random.RandomState(2).randint(0, 256, (2, 12, 12, 3), dtype=np.uint8)
        )
        a = make_stylize_fn(params, crop=8)(u8)
        b = make_stylize_fn(loaded, crop=8)(u8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNetService:
    def test_job_fn_through_service(self):
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_net_job_fn,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_service import (
            StyleTransferService,
        )

        params = transformer_net_init(jax.random.PRNGKey(3), width=4, n_res=1)
        svc = StyleTransferService(
            job_fn=make_net_job_fn(params, crop=8),
            style_names=["stripes"],
            crop=8, batch_size=2, max_delay_ms=30.0, num_iterations=1,
        ).start()
        try:
            rng = np.random.RandomState(3)
            futs = [
                svc.submit(rng.randint(0, 256, (32, 32, 3), dtype=np.uint8))
                for _ in range(3)
            ]
            for f in futs:
                r = f.result(timeout=120)
                assert r.image.shape == (8, 8, 3) and r.image.dtype == np.uint8
                assert r.iterations == 1
        finally:
            svc.stop()
        assert svc.stats()["jobs"] == 3


@pytest.fixture(scope="module")
def f2_encoder(tmp_path_factory):
    """Tiny family-2 encoder checkpoint + config json on disk."""
    from heuristique_style_transfer_code_tpu.checkpoint.io import (
        save_pytree_npz,
    )
    from heuristique_style_transfer_code_tpu.models.gram_attention import (
        gram_attention_init,
    )

    d = tmp_path_factory.mktemp("f2enc")
    cfg = {"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
           "gram_matrix_size": 4, "num_classes": 4, "seed": 0}
    cfg_path = str(d / "f2.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    variables = gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4)
    model_path = str(d / "model.npz")
    save_pytree_npz(variables, model_path)
    return cfg_path, model_path


class TestStyleNetCLI:
    def test_train_and_serve(self, tiny_imagefolder, f2_encoder, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.train_style_net import (
            main as train_main,
        )

        cfg_path, model_path = f2_encoder
        save_dir = str(tmp_path / "net_out")
        stylize_dir = str(tmp_path / "samples")
        style_path = str(
            next((tiny_imagefolder / "test" / "fog").glob("*.png"))
        )
        train_main([
            "--data", str(tiny_imagefolder), "--style_image", style_path,
            "--config_path", cfg_path, "--model_path", model_path,
            "--epochs", "1", "--batch_size", "4", "--num_samples", "8",
            "--width", "4", "--n_res", "1", "--crop", "32",
            "--log_every", "1", "--save_dir", save_dir,
            "--stylize_dir", stylize_dir, "--devices", "1", "--seed", "0",
        ])
        net_path = os.path.join(save_dir, "style_net.npz")
        assert os.path.exists(net_path)
        with open(os.path.join(save_dir, "style_net_hyperparameters.json")) as f:
            hyper = json.load(f)
        assert hyper["family"] == "style_net" and hyper["crop"] == 32
        assert hyper["final_loss"] is not None
        assert os.path.exists(os.path.join(stylize_dir, "stylise_0.png"))

        # serve the trained net: build_service --net path
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            build_parser,
            build_service,
        )

        args = build_parser().parse_args([
            "--net", net_path, "--batch_size", "2", "--max_delay_ms", "30",
        ])
        svc = build_service(args).start()
        try:
            img = np.random.RandomState(4).randint(
                0, 256, (64, 64, 3), dtype=np.uint8
            )
            assert svc.style_names == ["img_000"]  # hyper's style stem
            r = svc.submit(img, style="img_000").result(timeout=120)
            assert r.image.shape == (32, 32, 3)
            assert r.iterations == 1
        finally:
            svc.stop()


def _affine_map(fn, params):
    """Map fn over the conditional (S, C) instance-norm tables only."""
    def apply(path, leaf):
        names = {getattr(p, "key", None) for p in path}
        if getattr(leaf, "ndim", 0) == 2 and {"scale", "bias"} & names:
            return fn(leaf)
        return leaf

    return jax.tree_util.tree_map_with_path(apply, params)


def _distinct_cond_net(key, n_styles=2, width=4, n_res=1):
    """Conditional net whose per-style affines actually differ (the init's
    ones/zeros tables are style-identical by design)."""
    params = transformer_net_init(key, width=width, n_res=n_res,
                                  n_styles=n_styles)
    noise_key = jax.random.split(key, 1)[0]

    def perturb(leaf):
        nonlocal noise_key
        noise_key, sub = jax.random.split(noise_key)
        return leaf + 0.2 * jax.random.normal(sub, leaf.shape)

    return _affine_map(perturb, params)


class TestConditionalNet:
    """Conditional instance norm (Dumoulin et al.): one net, S styles."""

    def test_onehot_equals_sliced_single_style_net(self):
        from heuristique_style_transfer_code_tpu.nn.transformer_net import (
            net_n_styles,
            select_style,
        )

        params = _distinct_cond_net(jax.random.PRNGKey(0), n_styles=3)
        assert net_n_styles(params) == 3
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        for s in range(3):
            w = np.zeros((3,), np.float32)
            w[s] = 1.0
            out = transformer_net_apply(params, x, style_weights=jnp.asarray(w))
            sliced = select_style(params, s)
            assert net_n_styles(sliced) is None
            np.testing.assert_array_equal(
                np.asarray(out),
                np.asarray(transformer_net_apply(sliced, x)),
            )

    def test_blend_equals_blended_affines(self):
        """w=(a, 1-a) mixing IS the affine interpolation: identical to a
        plain net whose instance-norm affines are the same convex blend."""
        params = _distinct_cond_net(jax.random.PRNGKey(2), n_styles=2)
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 16, 3))
        w = jnp.asarray([0.3, 0.7])
        out = transformer_net_apply(params, x, style_weights=w)
        blended = _affine_map(lambda t: 0.3 * t[0] + 0.7 * t[1], params)
        # w @ table vs a*t0 + b*t1 round differently in f32 -> ~1 ULP drift
        np.testing.assert_allclose(
            np.asarray(out),
            np.asarray(transformer_net_apply(blended, x)),
            atol=5e-6,
        )

    def test_per_image_rows_match_per_style_calls(self):
        params = _distinct_cond_net(jax.random.PRNGKey(4), n_styles=2)
        x = jax.random.normal(jax.random.PRNGKey(5), (2, 16, 16, 3))
        per_image = transformer_net_apply(
            params, x, style_weights=jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
        )
        s0 = transformer_net_apply(params, x, style_weights=jnp.asarray([1.0, 0.0]))
        s1 = transformer_net_apply(params, x, style_weights=jnp.asarray([0.0, 1.0]))
        np.testing.assert_array_equal(np.asarray(per_image[0]), np.asarray(s0[0]))
        np.testing.assert_array_equal(np.asarray(per_image[1]), np.asarray(s1[1]))

    def test_style_weights_validation(self):
        cond = transformer_net_init(jax.random.PRNGKey(0), width=4, n_res=1,
                                    n_styles=2)
        plain = transformer_net_init(jax.random.PRNGKey(0), width=4, n_res=1)
        x = jnp.zeros((1, 8, 8, 3))
        with pytest.raises(ValueError, match="style_weights is required"):
            transformer_net_apply(cond, x)
        with pytest.raises(ValueError, match="single-style"):
            transformer_net_apply(plain, x, style_weights=jnp.asarray([1.0]))
        with pytest.raises(ValueError, match="!= n_styles"):
            transformer_net_apply(cond, x, style_weights=jnp.asarray([1.0, 0.0, 0.0]))

    def test_multi_train_specialises_styles(self):
        """One conditional net trained on two analytic pixel-Gram targets:
        each style's output Gram lands closer to its OWN target."""
        from heuristique_style_transfer_code_tpu.data.augment import (
            eval_preprocess,
        )
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_multi_style_train_step,
        )

        # style 0: horizontal stripes; style 1: flat bright
        s0 = np.zeros((8, 8, 3), np.float32)
        s0[::2] = 1.0
        s1 = np.full((8, 8, 3), 0.9, np.float32)
        stacks = [
            jnp.stack([
                gram_matrix_nhwc(
                    jnp.asarray((s - IMAGENET_MEAN) / IMAGENET_STD)[None]
                )[0]
                for s in (s0, s1)
            ])
        ]

        rng = np.random.RandomState(0)
        images_u8 = jnp.asarray(rng.randint(0, 256, (4, 12, 12, 3), np.uint8))
        params = transformer_net_init(jax.random.PRNGKey(0), width=4, n_res=1,
                                      n_styles=2)
        init_opt, step = make_multi_style_train_step(
            _identity_extract, style_weight=1.0, content_weight=0.05,
            learning_rate=5e-3, crop=8,
        )
        opt_state = init_opt(params)
        onehots = np.eye(2, dtype=np.float32)
        losses = []
        srng = np.random.default_rng(0)
        for _ in range(150):
            w = jnp.asarray(onehots[srng.integers(0, 2, size=4)])
            params, opt_state, loss = step(params, opt_state, images_u8, w,
                                           stacks)
            losses.append(float(loss))
        assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

        content = eval_preprocess(images_u8, 8)
        outs = [
            transformer_net_apply(
                params, content, style_weights=jnp.asarray(onehots[s])
            )
            for s in range(2)
        ]
        for s in range(2):
            g = gram_matrix_nhwc(outs[s])
            d_own = float(jnp.mean(jnp.square(g - stacks[0][s])))
            d_other = float(jnp.mean(jnp.square(g - stacks[0][1 - s])))
            assert d_own < d_other, (s, d_own, d_other)

    def test_conditional_job_fn_through_service(self):
        """The service's per-request style_w drives the conditional affines:
        one-hot picks match direct stylize calls exactly, blends are
        accepted, unknown names rejected."""
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_net_job_fn,
            make_stylize_fn,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_service import (
            StyleTransferService,
        )

        params = _distinct_cond_net(jax.random.PRNGKey(6), n_styles=2)
        svc = StyleTransferService(
            job_fn=make_net_job_fn(params, crop=8),
            style_names=["stripes", "flat"],
            crop=8, batch_size=2, max_delay_ms=30.0, num_iterations=1,
        ).start()
        try:
            rng = np.random.RandomState(7)
            img = rng.randint(0, 256, (8, 8, 3), dtype=np.uint8)
            r0 = svc.submit(img, style="stripes").result(timeout=120)
            r1 = svc.submit(img, style="flat").result(timeout=120)
            rb = svc.submit(
                img, style={"stripes": 0.5, "flat": 0.5}
            ).result(timeout=120)
            with pytest.raises(ValueError, match="unknown style"):
                svc.submit(img, style="nope")
        finally:
            svc.stop()
        direct0 = np.asarray(make_stylize_fn(
            params, crop=8, style_weights=jnp.asarray([1.0, 0.0])
        )(jnp.asarray(img[None])))[0]
        np.testing.assert_array_equal(r0.image, direct0)
        assert not np.array_equal(r0.image, r1.image)
        assert rb.image.shape == (8, 8, 3)

    def test_multi_cli_train_and_serve(self, tiny_imagefolder, f2_encoder,
                                       tmp_path):
        """Two --style_image flags -> a conditional net; serve_style --net
        honours X-Style picks from the persisted gallery names."""
        from heuristique_style_transfer_code_tpu.cli.train_style_net import (
            main as train_main,
        )

        cfg_path, model_path = f2_encoder
        save_dir = str(tmp_path / "net_out")
        stylize_dir = str(tmp_path / "samples")
        pngs = sorted((tiny_imagefolder / "test" / "fog").glob("*.png"))
        train_main([
            "--data", str(tiny_imagefolder),
            "--style_image", f"alpha={pngs[0]}",
            "--style_image", f"beta={pngs[1]}",
            "--config_path", cfg_path, "--model_path", model_path,
            "--epochs", "1", "--batch_size", "4", "--num_samples", "8",
            "--width", "4", "--n_res", "1", "--crop", "32",
            "--log_every", "1", "--save_dir", save_dir,
            "--stylize_dir", stylize_dir, "--devices", "1", "--seed", "0",
        ])
        net_path = os.path.join(save_dir, "style_net.npz")
        with open(os.path.join(save_dir,
                               "style_net_hyperparameters.json")) as f:
            hyper = json.load(f)
        assert hyper["style_names"] == ["alpha", "beta"]
        assert os.path.exists(os.path.join(stylize_dir, "stylise_alpha_0.png"))
        assert os.path.exists(os.path.join(stylize_dir, "stylise_beta_0.png"))

        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            build_parser,
            build_service,
        )

        args = build_parser().parse_args([
            "--net", net_path, "--batch_size", "2", "--max_delay_ms", "30",
        ])
        svc = build_service(args).start()
        try:
            assert svc.style_names == ["alpha", "beta"]
            img = np.random.RandomState(8).randint(
                0, 256, (64, 64, 3), dtype=np.uint8
            )
            ra = svc.submit(img, style="alpha").result(timeout=120)
            rblend = svc.submit(
                img, style={"alpha": 0.5, "beta": 0.5}
            ).result(timeout=120)
            assert ra.image.shape == (32, 32, 3) and ra.iterations == 1
            assert rblend.image.shape == (32, 32, 3)
        finally:
            svc.stop()


class TestStyleNetResume:
    """Elastic resume + SIGTERM preemption for hst-train-style-net — the
    same resilience contract the family train CLIs have (TestEpochResume /
    test_preemption.py), held by the fast-style fit."""

    def _args(self, tiny_imagefolder, f2_encoder, save_dir, *styles,
              extra=()):
        cfg_path, model_path = f2_encoder
        style_flags = []
        for s in styles:
            style_flags += ["--style_image", s]
        return [
            "--data", str(tiny_imagefolder), *style_flags,
            "--config_path", cfg_path, "--model_path", model_path,
            "--epochs", "2", "--batch_size", "4", "--num_samples", "8",
            "--width", "4", "--n_res", "1", "--crop", "32",
            "--log_every", "1", "--save_dir", save_dir,
            "--devices", "1", "--seed", "0", *extra,
        ]

    @pytest.mark.parametrize("multi", [False, True])
    def test_interrupt_and_resume_bit_identical(
        self, tiny_imagefolder, f2_encoder, tmp_path, monkeypatch, multi
    ):
        """Preempt the fit mid-epoch (after a step-granular checkpoint),
        resume, and require the final net to be BIT-identical to an
        uninterrupted run — pins the checkpoint tree, the loader's
        mid-epoch set_position replay, the counter-based style draws
        (multi), and the optimiser-state restore."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.train_style_net import (
            main,
        )
        from heuristique_style_transfer_code_tpu.tasks import fast_style
        from heuristique_style_transfer_code_tpu.train import preemption

        style_a = str(next((tiny_imagefolder / "test" / "fog").glob("*.png")))
        styles = [style_a]
        if multi:
            rain = str(next((tiny_imagefolder / "test" / "rain").glob("*.png")))
            styles = [f"fog={style_a}", f"rain={rain}"]

        # run A: uninterrupted, no resume machinery at all
        dir_a = str(tmp_path / "a")
        main(self._args(tiny_imagefolder, f2_encoder, dir_a, *styles))

        # run B part 1: --resume + step-granular checkpoints, preempted at
        # the 4th batch boundary (deterministic: the driver re-imports the
        # flag check each call, so the monkeypatched module attribute is
        # what it sees)
        dir_b = str(tmp_path / "b")
        args_b = self._args(
            tiny_imagefolder, f2_encoder, dir_b, *styles,
            extra=("--resume", "--checkpoint_every", "1"),
        )
        calls = {"n": 0}

        def fake_preempt():
            calls["n"] += 1
            return calls["n"] > 3

        monkeypatch.setattr(preemption, "preemption_requested", fake_preempt)
        main(args_b)
        assert not os.path.exists(os.path.join(dir_b, "style_net.npz"))
        assert os.path.exists(
            os.path.join(dir_b, fast_style._INPROGRESS_NET)
        )
        monkeypatch.undo()

        # run B part 2: same command + --resume continues to completion
        main(args_b)
        assert not os.path.exists(
            os.path.join(dir_b, fast_style._INPROGRESS_NET)
        ), "completed fit must clear the in-progress artifact"

        ta = load_pytree_npz(os.path.join(dir_a, "style_net.npz"), as_jax=False)
        tb = load_pytree_npz(os.path.join(dir_b, "style_net.npz"), as_jax=False)
        la = jax.tree_util.tree_leaves(ta)
        lb = jax.tree_util.tree_leaves(tb)
        assert len(la) == len(lb)
        for x, y in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        with open(os.path.join(dir_a, "style_net_hyperparameters.json")) as f:
            ha = json.load(f)
        with open(os.path.join(dir_b, "style_net_hyperparameters.json")) as f:
            hb = json.load(f)
        assert ha["final_loss"] == hb["final_loss"]

    def test_signature_mismatch_rejected(
        self, tiny_imagefolder, f2_encoder, tmp_path, monkeypatch
    ):
        from heuristique_style_transfer_code_tpu.cli.train_style_net import (
            main,
        )
        from heuristique_style_transfer_code_tpu.train import preemption

        style = str(next((tiny_imagefolder / "test" / "fog").glob("*.png")))
        d = str(tmp_path / "s")
        calls = {"n": 0}

        def fake_preempt():
            calls["n"] += 1
            return calls["n"] > 2

        monkeypatch.setattr(preemption, "preemption_requested", fake_preempt)
        main(self._args(tiny_imagefolder, f2_encoder, d, style,
                        extra=("--resume", "--checkpoint_every", "1")))
        monkeypatch.undo()
        with pytest.raises(ValueError, match="does not match"):
            main(self._args(
                tiny_imagefolder, f2_encoder, d, style,
                extra=("--resume", "--style_weight", "2.0"),
            ))

    def test_async_checkpoint_resume(
        self, tiny_imagefolder, f2_encoder, tmp_path, monkeypatch
    ):
        """--async_checkpoint writes the same artifact from a background
        thread; a preempted+resumed fit still matches the uninterrupted
        one."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.train_style_net import (
            main,
        )
        from heuristique_style_transfer_code_tpu.train import preemption

        style = str(next((tiny_imagefolder / "test" / "fog").glob("*.png")))
        dir_a = str(tmp_path / "a")
        main(self._args(tiny_imagefolder, f2_encoder, dir_a, style))
        dir_b = str(tmp_path / "b")
        args_b = self._args(
            tiny_imagefolder, f2_encoder, dir_b, style,
            extra=("--resume", "--checkpoint_every", "1",
                   "--async_checkpoint"),
        )
        calls = {"n": 0}

        def fake_preempt():
            calls["n"] += 1
            return calls["n"] > 3

        monkeypatch.setattr(preemption, "preemption_requested", fake_preempt)
        main(args_b)
        monkeypatch.undo()
        main(args_b)
        ta = load_pytree_npz(os.path.join(dir_a, "style_net.npz"), as_jax=False)
        tb = load_pytree_npz(os.path.join(dir_b, "style_net.npz"), as_jax=False)
        for x, y in zip(jax.tree_util.tree_leaves(ta),
                        jax.tree_util.tree_leaves(tb)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    def test_schedule_and_clip(self, tiny_imagefolder, f2_encoder, tmp_path):
        """--lr_schedule/--warmup_steps/--clip_grad_norm produce a finite
        fit that actually differs from the constant-rate one (the schedule
        is live), via the same schedules module the family CLIs use."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.train_style_net import (
            main,
        )

        style = str(next((tiny_imagefolder / "test" / "fog").glob("*.png")))
        d_const = str(tmp_path / "const")
        main(self._args(tiny_imagefolder, f2_encoder, d_const, style))
        d_sched = str(tmp_path / "sched")
        main(self._args(
            tiny_imagefolder, f2_encoder, d_sched, style,
            extra=("--lr_schedule", "cosine", "--warmup_steps", "2",
                   "--min_lr_ratio", "0.1", "--clip_grad_norm", "1.0"),
        ))
        tc = load_pytree_npz(os.path.join(d_const, "style_net.npz"), as_jax=False)
        ts = load_pytree_npz(os.path.join(d_sched, "style_net.npz"), as_jax=False)
        diffs = [
            float(np.max(np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64))))
            for x, y in zip(jax.tree_util.tree_leaves(tc),
                            jax.tree_util.tree_leaves(ts))
        ]
        assert all(np.isfinite(d) for d in diffs)
        assert max(diffs) > 0.0
        with open(os.path.join(d_sched, "style_net_hyperparameters.json")) as f:
            assert np.isfinite(json.load(f)["final_loss"])


class TestNetMultiSizeDispatch:
    def test_net_multi_size_dispatch(self):
        """A {size: net_job} mapping gives the --net service the same
        multi-size ladder as the iterative path: a lone job rides the small
        compiled size, a burst the big one, and the small-size result is
        bit-identical to a dedicated small-batch service."""
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_net_job_fn,
        )
        from heuristique_style_transfer_code_tpu.tasks.style_service import (
            StyleTransferService,
        )

        params = transformer_net_init(jax.random.PRNGKey(3), width=4, n_res=1)
        job = make_net_job_fn(params, crop=8)
        rng = np.random.RandomState(7)
        imgs = [rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
                for _ in range(4)]
        svc = StyleTransferService(
            job_fn={2: job, 4: job}, style_names=["stripes"],
            crop=8, max_delay_ms=30.0, num_iterations=1,
        ).start()
        try:
            assert svc.batch_sizes == [2, 4] and svc.batch_size == 4
            r_lone = svc.submit(imgs[0]).result(timeout=120)
            futs = [svc.submit(im) for im in imgs]
            for f in futs:
                f.result(timeout=120)
            hist = svc.stats()["batch_size_hist"]
        finally:
            svc.stop()
        assert hist.get("2", 0) >= 1
        assert hist.get("4", 0) >= 1
        ref = StyleTransferService(
            job_fn={2: job}, style_names=["stripes"],
            crop=8, max_delay_ms=30.0, num_iterations=1,
        ).start()
        try:
            r_ref = ref.submit(imgs[0]).result(timeout=120)
        finally:
            ref.stop()
        np.testing.assert_array_equal(r_lone.image, r_ref.image)

    def test_serve_cli_net_multi_size(self, tiny_imagefolder, f2_encoder,
                                      tmp_path):
        """hst-serve-style --net --batch_size 2,4: the flag is honoured
        (round-3 pinned sizes[-1] and silently ignored the rest)."""
        from heuristique_style_transfer_code_tpu.cli.train_style_net import (
            main as train_main,
        )
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            build_parser,
            build_service,
        )

        cfg_path, model_path = f2_encoder
        save_dir = str(tmp_path / "net_out")
        style_path = str(
            next((tiny_imagefolder / "test" / "fog").glob("*.png"))
        )
        train_main([
            "--data", str(tiny_imagefolder), "--style_image", style_path,
            "--config_path", cfg_path, "--model_path", model_path,
            "--epochs", "1", "--batch_size", "4", "--num_samples", "4",
            "--width", "4", "--n_res", "1", "--crop", "32",
            "--log_every", "1", "--save_dir", save_dir, "--devices", "1",
        ])
        args = build_parser().parse_args([
            "--net", os.path.join(save_dir, "style_net.npz"),
            "--batch_size", "2,4", "--max_delay_ms", "30",
        ])
        svc = build_service(args).start()
        try:
            assert svc.batch_sizes == [2, 4]
            rng = np.random.RandomState(4)
            img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
            r = svc.submit(img).result(timeout=120)
            assert r.image.shape == (32, 32, 3) and r.iterations == 1
            futs = [
                svc.submit(rng.randint(0, 256, (64, 64, 3), dtype=np.uint8))
                for _ in range(4)
            ]
            for f in futs:
                f.result(timeout=120)
            hist = svc.stats()["batch_size_hist"]
        finally:
            svc.stop()
        assert hist.get("2", 0) >= 1 and hist.get("4", 0) >= 1


class TestNetQuality:
    def test_net_is_worth_iterations_of_the_loop(self):
        """Quality floor for the fast net: on HELD-OUT content, the one-pass
        net's achieved content+style loss (scored by the iterative loop's
        exact objective — one shared loss definition,
        style_transfer.make_per_image_content_style_loss) must match at
        least 10 iterations of the loop it replaces. Pins the quality axis
        of the throughput claim (PERF.md prices the real encoder's net the
        same way)."""
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            compare_net_to_loop,
            make_fast_style_train_step,
        )

        style_grams = _style_target()
        rng = np.random.RandomState(0)
        train_u8 = jnp.asarray(
            rng.randint(0, 256, (8, 12, 12, 3), dtype=np.uint8)
        )
        held_u8 = jnp.asarray(
            rng.randint(0, 256, (6, 12, 12, 3), dtype=np.uint8)
        )
        params = transformer_net_init(jax.random.PRNGKey(0), width=4, n_res=1)
        init_opt, step = make_fast_style_train_step(
            _identity_extract, style_weight=1.0, content_weight=0.1,
            learning_rate=5e-3, crop=8,
        )
        opt = init_opt(params)
        for _ in range(300):
            params, opt, _ = step(params, opt, train_u8, style_grams)

        r = compare_net_to_loop(
            _identity_extract, params, held_u8, style_grams, crop=8,
            iteration_grid=(1, 5, 10, 25), style_weight=1.0,
            content_weight=0.1, learning_rates=(0.01, 0.05),
        )
        # structure: per-image arrays align, loop losses decrease with k
        assert r["net_loss_per_image"].shape == (6,)
        means = [r["loop_loss_mean"][k] for k in (1, 5, 10, 25)]
        assert means == sorted(means, reverse=True)
        # the denominator is the best-of-sweep loop (r5: pricing against
        # the serve-default lr alone flattered the net)
        assert r["learning_rates"] == (0.01, 0.05)
        assert set(r["loop_best_lr"].values()) <= {0.01, 0.05}
        # the floor: measured on this fixture the net beats the WHOLE grid
        # with ~3x headroom at k=25 (net 0.787 vs loop 2.41); assert the
        # max-grid worth plus a 5% margin under loop@25 so a real quality
        # regression trips it (was a token >= 10 before r5)
        assert r["worth_iterations"] == 25, r
        assert r["net_loss_mean"] <= 0.95 * r["loop_loss_mean"][25], r


class TestReviewFixesR4:
    def test_sizes_gcd_guards_mesh(self):
        from heuristique_style_transfer_code_tpu.cli.serve_style import (
            _sizes_gcd,
        )

        assert _sizes_gcd([6, 8]) == 2
        assert _sizes_gcd([8, 64]) == 8
        assert _sizes_gcd([7]) == 7

    def test_layers_in_resume_signature(
        self, tiny_imagefolder, f2_encoder, tmp_path, monkeypatch
    ):
        """--layers changes the loss objective, so resuming under a
        different value must be rejected (review finding r4)."""
        from heuristique_style_transfer_code_tpu.cli.train_style_net import (
            main,
        )
        from heuristique_style_transfer_code_tpu.train import preemption

        cfg_path, model_path = f2_encoder
        style = str(next((tiny_imagefolder / "test" / "fog").glob("*.png")))
        d = str(tmp_path / "s")
        base = [
            "--data", str(tiny_imagefolder), "--style_image", style,
            "--config_path", cfg_path, "--model_path", model_path,
            "--epochs", "2", "--batch_size", "4", "--num_samples", "8",
            "--width", "4", "--n_res", "1", "--crop", "32",
            "--log_every", "1", "--save_dir", d, "--devices", "1",
            "--resume", "--checkpoint_every", "1",
        ]
        calls = {"n": 0}

        def fake_preempt():
            calls["n"] += 1
            return calls["n"] > 1

        monkeypatch.setattr(preemption, "preemption_requested", fake_preempt)
        main(base)
        monkeypatch.undo()
        with pytest.raises(ValueError, match="does not match"):
            main(base + ["--layers", "4"])

    def test_mid_epoch_resume_requires_set_position(self, tmp_path):
        """A loader without set_position cannot replay mid-epoch; silent
        re-training of consumed batches must be a loud error."""
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            _save_net_inprogress,
            train_fast_style,
        )

        rng = np.random.RandomState(1)
        batch = rng.randint(0, 256, (4, 12, 12, 3), dtype=np.uint8)
        loader = [(batch, None, None, None)] * 3  # no set_position
        params = transformer_net_init(jax.random.PRNGKey(1), width=4, n_res=1)
        style_u8 = rng.randint(0, 256, (16, 16, 3), dtype=np.uint8)
        import optax

        opt_state = optax.adam(1e-3).init(params)
        _save_net_inprogress(
            str(tmp_path), params, opt_state, 0, 1, 1, [], "sig-x"
        )
        with pytest.raises(ValueError, match="set_position"):
            train_fast_style(
                params, _identity_extract, loader, style_u8,
                epochs=1, crop=8, save_dir=str(tmp_path), resume=True,
                signature="sig-x", log_fn=lambda *_: None,
            )

    def test_in_backend_plumbed_through_serving_builders(self):
        """The documented per-call backend selector exists on the serving
        entry points (review finding r4); 'xla' must behave identically."""
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            make_net_job_fn,
            make_stylize_fn,
        )

        params = transformer_net_init(jax.random.PRNGKey(3), width=4, n_res=1)
        u8 = jnp.asarray(
            np.random.RandomState(2).randint(0, 256, (2, 12, 12, 3),
                                             dtype=np.uint8)
        )
        a = make_stylize_fn(params, crop=8)(u8)
        b = make_stylize_fn(params, crop=8, in_backend="xla")(u8)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        job = make_net_job_fn(params, crop=8, in_backend="xla")
        out, iters, losses = jax.jit(job)(
            u8, jnp.ones((2, 1), jnp.float32), jnp.arange(2, dtype=jnp.int32)
        )
        np.testing.assert_array_equal(np.asarray(out), np.asarray(a))

    def test_save_style_artifact_exported(self):
        from heuristique_style_transfer_code_tpu.deploy import (
            save_style_artifact,
        )

        assert callable(save_style_artifact)


class TestConditionalNetQuality:
    def test_conditional_net_worth_floor_per_style(self):
        """The gallery net's quality floor, per style: trained on two
        distinct pixel-Gram targets with style-BALANCED batches, each
        style's one-hot forward must match the deepest measured loop
        (best-of-lr-sweep denominator) on held-out content with margin —
        the conditional counterpart of TestNetQuality; on-chip pricing in
        PERF.md. Width 8: the r4 width-4 fit left the weaker style 1%
        from the loop@25 line; the conditional IN affines are per-style
        but the shared convs need the extra capacity (r5 lever sweep)."""
        from heuristique_style_transfer_code_tpu.tasks.fast_style import (
            balanced_style_indices,
            compare_net_to_loop,
            make_multi_style_train_step,
        )

        # two analytic styles: horizontal stripes and its inverse-channel
        # twin — distinct pixel Grams
        s0 = np.zeros((1, 8, 8, 3), np.float32); s0[:, ::2] = 1.0
        s1 = np.zeros((1, 8, 8, 3), np.float32); s1[:, :, ::2, :2] = 1.0
        stacks = [jnp.concatenate([
            gram_matrix_nhwc(jnp.asarray((s - IMAGENET_MEAN) / IMAGENET_STD))
            for s in (s0, s1)
        ])]

        rng = np.random.RandomState(0)
        train_u8 = jnp.asarray(
            rng.randint(0, 256, (8, 12, 12, 3), dtype=np.uint8)
        )
        held_u8 = jnp.asarray(
            rng.randint(0, 256, (6, 12, 12, 3), dtype=np.uint8)
        )
        params = transformer_net_init(
            jax.random.PRNGKey(0), width=8, n_res=1, n_styles=2
        )
        init_opt, step = make_multi_style_train_step(
            _identity_extract, style_weight=1.0, content_weight=0.1,
            learning_rate=5e-3, crop=8,
        )
        opt = init_opt(params)
        for i in range(300):
            # style-balanced batches (balanced_style_indices): random draws
            # leave one style under-trained on short fits
            onehot = np.zeros((8, 2), np.float32)
            idx = balanced_style_indices(8, 2, np.random.RandomState(i))
            onehot[np.arange(8), idx] = 1.0
            params, opt, _ = step(
                params, opt, train_u8, jnp.asarray(onehot), stacks
            )

        for s in range(2):
            onehot = np.zeros((2,), np.float32)
            onehot[s] = 1.0
            r = compare_net_to_loop(
                _identity_extract, params, held_u8,
                [stacks[0][s:s + 1]], crop=8,
                iteration_grid=(1, 5, 10, 25), style_weight=1.0,
                content_weight=0.1, learning_rates=(0.01, 0.05),
                style_weights=jnp.asarray(onehot),
            )
            # measured on this fixture (width 8, balanced draws): style 0
            # net 0.677 vs loop@25 2.41, style 1 net 0.629 vs 0.770 — the
            # slim one sets the 10% margin. Was a token >= 10 before r5.
            assert r["worth_iterations"] == 25, (s, r)
            assert r["net_loss_mean"] <= 0.90 * r["loop_loss_mean"][25], (s, r)


def test_net_service_aot_export_round_trip(tiny_imagefolder, f2_encoder,
                                           tmp_path):
    """hst-serve-style --net --export_artifact: the fastest serving mode
    exports its multi-size AOT ladder too (0.1 MB — just the 56 k-param
    toy net as StableHLO constants), and the artifact serves with
    dispatch-size parity and equal results."""
    from heuristique_style_transfer_code_tpu.cli.serve_style import (
        build_parser,
        build_service,
        export_artifact,
    )
    from heuristique_style_transfer_code_tpu.cli.train_style_net import (
        main as train_main,
    )

    cfg_path, model_path = f2_encoder
    save_dir = str(tmp_path / "net_out")
    style_path = str(next((tiny_imagefolder / "test" / "fog").glob("*.png")))
    train_main([
        "--data", str(tiny_imagefolder), "--style_image", style_path,
        "--config_path", cfg_path, "--model_path", model_path,
        "--epochs", "1", "--batch_size", "4", "--num_samples", "4",
        "--width", "4", "--n_res", "1", "--crop", "32",
        "--log_every", "1", "--save_dir", save_dir, "--devices", "1",
    ])
    net_path = os.path.join(save_dir, "style_net.npz")
    art_path = str(tmp_path / "net_art.npz")
    export_artifact(build_parser().parse_args([
        "--net", net_path, "--batch_size", "2,4",
        "--export_artifact", art_path,
    ]))

    img = np.random.RandomState(4).randint(0, 256, (64, 64, 3), np.uint8)
    results = {}
    for name, argv in (
        ("live", ["--net", net_path, "--batch_size", "2,4",
                  "--max_delay_ms", "30"]),
        ("artifact", ["--artifact", art_path, "--max_delay_ms", "30"]),
    ):
        svc = build_service(build_parser().parse_args(argv)).start()
        try:
            assert svc.batch_sizes == [2, 4]
            results[name] = svc.submit(img).result(timeout=120)
        finally:
            svc.stop()
    assert results["live"].iterations == results["artifact"].iterations == 1
    np.testing.assert_allclose(
        results["live"].image.astype(np.int32),
        results["artifact"].image.astype(np.int32), atol=1,
    )
