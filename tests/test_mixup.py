"""Mixup/CutMix batch mixing (train/mixing.py, --mixup/--cutmix).

Additive TPU extra (no reference counterpart): timm-batch-mode semantics
with a ROLLED partner (sharding-friendly collective-permute instead of a
gather by a random permutation — module docstring documents the deviation).
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.train.mixing import (
    cutmix_box,
    make_mix_fn,
    mix_key_from,
)


def _batch(key, b=6, s=8):
    kx, kl = jax.random.split(jax.random.PRNGKey(key))
    x = jax.random.uniform(kx, (b, s, s, 3), jnp.float32)
    y = jax.random.randint(kl, (b,), 0, 4)
    return x, y


class TestMixKernels:
    def test_off_returns_none(self):
        assert make_mix_fn() is None
        assert make_mix_fn(0.0, 0.0) is None
        assert make_mix_fn(None, None) is None

    def test_mixup_is_a_rolled_blend(self):
        """The output must be lam*x + (1-lam)*roll(x, s) for the returned lam
        and SOME shift s, with the label pair rolled by the same s."""
        x, y = _batch(0)
        mix = make_mix_fn(mixup_alpha=0.4)
        mixed, y_a, y_b, lam = mix(x, y, jax.random.PRNGKey(7))
        lam = float(lam)
        assert 0.0 <= lam <= 1.0
        np.testing.assert_array_equal(np.asarray(y_a), np.asarray(y))
        matches = []
        for s in range(1, x.shape[0]):
            want = lam * np.asarray(x) + (1 - lam) * np.roll(np.asarray(x), s, axis=0)
            if np.allclose(np.asarray(mixed), want, atol=1e-6):
                matches.append(s)
        assert len(matches) == 1
        np.testing.assert_array_equal(
            np.asarray(y_b), np.roll(np.asarray(y), matches[0])
        )

    def test_cutmix_pastes_a_box_and_corrects_lam(self):
        """Every pixel comes from x or its rolled partner; the partner share
        must equal exactly 1 - lam (the corrected value)."""
        x, y = _batch(1, b=5, s=16)
        mix = make_mix_fn(cutmix_alpha=1.0)
        found = False
        for trial in range(8):  # find a draw with a non-degenerate box
            mixed, y_a, y_b, lam = mix(x, y, jax.random.PRNGKey(trial))
            lam = float(lam)
            xn, mn = np.asarray(x), np.asarray(mixed)
            for s in range(1, x.shape[0]):
                part = np.roll(xn, s, axis=0)
                from_self = np.isclose(mn, xn).all(axis=(0, 3))
                from_part = np.isclose(mn, part).all(axis=(0, 3))
                if (from_self | from_part).all():
                    share = 1.0 - from_self.mean()
                    if 0.0 < share < 1.0:
                        assert share == pytest.approx(1.0 - lam, abs=1e-6)
                        found = True
            if found:
                break
        assert found

    def test_cutmix_box_bounds_and_degenerate_lam(self):
        key = jax.random.PRNGKey(3)
        (y1, x1, y2, x2), lam_adj = cutmix_box(key, 24, 32, jnp.float32(0.3))
        assert 0 <= int(y1) <= int(y2) <= 24
        assert 0 <= int(x1) <= int(x2) <= 32
        area = (int(y2) - int(y1)) * (int(x2) - int(x1))
        assert float(lam_adj) == pytest.approx(1.0 - area / (24 * 32), abs=1e-6)
        # lam = 1 -> ratio 0 -> empty box -> corrected lam exactly 1
        _, lam1 = cutmix_box(key, 24, 32, jnp.float32(1.0))
        assert float(lam1) == pytest.approx(1.0)

    def test_switch_uses_both_modes(self):
        """With both alphas on, some batches mix (blend: pixels from neither
        source) and some cut (every pixel from a source)."""
        x, y = _batch(2, b=4, s=12)
        mix = make_mix_fn(mixup_alpha=0.4, cutmix_alpha=1.0)
        kinds = set()
        for t in range(12):
            mixed, _, _, lam = mix(x, y, jax.random.PRNGKey(t))
            if not (0.02 < float(lam) < 0.98):
                continue  # degenerate draw: both modes look like identity
            xn, mn = np.asarray(x), np.asarray(mixed)
            pure = np.zeros(mn.shape[:1] + mn.shape[1:3], bool)
            for s in range(x.shape[0]):
                pure |= np.isclose(mn, np.roll(xn, s, axis=0), atol=1e-6).all(axis=3)
            kinds.add("cutmix" if pure.all() else "mixup")
            if len(kinds) == 2:
                break
        assert kinds == {"cutmix", "mixup"}

    def test_mix_key_differs_from_step_key(self):
        k = jax.random.PRNGKey(5)
        assert not np.array_equal(np.asarray(mix_key_from(k)), np.asarray(k))


def _linear_model():
    def fwd(v, images):
        return images.reshape(images.shape[0], -1) @ v["w"] + v["b"], None

    def init(key):
        return {
            "w": jax.random.normal(key, (8 * 8 * 3, 4), jnp.float32) * 0.01,
            "b": jnp.zeros((4,), jnp.float32),
        }

    return fwd, init


def _identity_augment(images_u8, combos, key):
    return images_u8.astype(jnp.float32) / 255.0


def _fresh(tree):
    """Deep-copy a pytree's buffers (the jitted steps donate their state
    arguments; reusing the same buffers across calls would be use-after-free)."""
    return jax.tree_util.tree_map(lambda a: jnp.array(np.asarray(a)), tree)


class TestTrainStepIntegration:
    def test_loss_is_the_pinned_mixed_ce(self):
        """A stub mix_fn with pinned (lam, shift) pins the body's loss to the
        hand-computed lam*CE(y) + (1-lam)*CE(roll(y)) exactly."""
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_train_step_body,
            masked_cross_entropy,
        )

        fwd, init = _linear_model()
        v = init(jax.random.PRNGKey(0))
        opt = sgd_momentum(0.1, v)
        lam = 0.3

        def stub_mix(images, labels, key):
            return images, labels, jnp.roll(labels, 1), jnp.float32(lam)

        body = make_train_step_body(fwd, opt, _identity_augment, mix_fn=stub_mix)
        x8 = np.random.RandomState(0).randint(0, 256, (6, 8, 8, 3), np.uint8)
        y = jnp.asarray([0, 1, 2, 3, 0, 1])
        _, _, loss = body(v, opt.init(v), jnp.asarray(x8), y,
                          jnp.zeros(6, jnp.int32), jax.random.PRNGKey(1))
        logits, _ = fwd(v, _identity_augment(jnp.asarray(x8), None, None))
        want = lam * masked_cross_entropy(logits, y) + (1 - lam) * (
            masked_cross_entropy(logits, jnp.roll(y, 1))
        )
        assert float(loss) == pytest.approx(float(want), rel=1e-6)

    def test_accum_equals_plain_with_mixing(self):
        """Grad accumulation with Mixup/CutMix reproduces the plain mixed
        step (same key -> same lam/shift/box; BN-free model -> 1e-6)."""
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_train_step,
            make_train_step_accum,
        )

        fwd, init = _linear_model()
        v = init(jax.random.PRNGKey(0))
        opt = sgd_momentum(0.1, v)
        mix = make_mix_fn(mixup_alpha=0.4, cutmix_alpha=1.0)
        plain = make_train_step(fwd, opt, _identity_augment, mix_fn=mix)
        accum = make_train_step_accum(fwd, opt, _identity_augment, 3, mix_fn=mix)

        x8 = jnp.asarray(
            np.random.RandomState(1).randint(0, 256, (6, 8, 8, 3), np.uint8)
        )
        y = jnp.asarray([0, 1, 2, 3, -1, 1])
        c = jnp.zeros(6, jnp.int32)
        for seed in (0, 1, 2):
            k = jax.random.PRNGKey(seed)
            va, vb = _fresh(v), _fresh(v)
            v1, o1, l1 = plain(va, opt.init(va), x8, y, c, k)
            v2, o2, l2 = accum(vb, opt.init(vb), x8, y, c, k)
            assert float(l1) == pytest.approx(float(l2), abs=1e-6)
            for a, b in zip(jax.tree_util.tree_leaves(v1),
                            jax.tree_util.tree_leaves(v2)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           atol=1e-6)

    def test_multi_dispatch_matches_single_with_mixing(self):
        """K-steps-per-dispatch with mixing matches K single dispatches.
        The unmixed multi path is bit-identical (test_data_and_train); the
        mixing elementwise ops fuse differently inside the scan body than in
        the standalone step, so equality here is float-tolerance (~1 ULP),
        not bitwise."""
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_train_step,
            make_train_step_multi,
        )

        fwd, init = _linear_model()
        v = init(jax.random.PRNGKey(0))
        opt = sgd_momentum(0.1, v)
        mix = make_mix_fn(mixup_alpha=0.2)
        one = make_train_step(fwd, opt, _identity_augment, mix_fn=mix)
        multi = make_train_step_multi(fwd, opt, _identity_augment, mix_fn=mix)

        rng = np.random.RandomState(2)
        xs = jnp.asarray(rng.randint(0, 256, (3, 4, 8, 8, 3), np.uint8))
        ys = jnp.asarray(rng.randint(0, 4, (3, 4)))
        cs = jnp.zeros((3, 4), jnp.int32)
        keys = jnp.stack([jax.random.PRNGKey(i) for i in range(3)])

        va = _fresh(v)
        va, oa = va, opt.init(va)
        losses = []
        for i in range(3):
            va, oa, l = one(va, oa, xs[i], ys[i], cs[i], keys[i])
            losses.append(float(l))
        vb = _fresh(v)
        vb, ob, lb = multi(vb, opt.init(vb), xs, ys, cs, keys)
        np.testing.assert_allclose(np.asarray(lb),
                                   np.asarray(losses, np.float32), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(va),
                        jax.tree_util.tree_leaves(vb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_sharded_equals_single_device(self):
        """The rolled partner is layout-only under batch sharding (roll
        compiles to a collective-permute, not an all-to-all)."""
        from jax.sharding import Mesh
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_train_step,
        )

        fwd, init = _linear_model()
        v = init(jax.random.PRNGKey(0))
        opt = sgd_momentum(0.1, v)
        mix = make_mix_fn(mixup_alpha=0.4, cutmix_alpha=1.0)
        mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
        single = make_train_step(fwd, opt, _identity_augment, mix_fn=mix)
        sharded = make_train_step(fwd, opt, _identity_augment, mesh=mesh,
                                  mix_fn=mix)

        x8 = jnp.asarray(
            np.random.RandomState(3).randint(0, 256, (8, 8, 8, 3), np.uint8)
        )
        y = jnp.asarray([0, 1, 2, 3, 0, 1, -1, 2])
        c = jnp.zeros(8, jnp.int32)
        k = jax.random.PRNGKey(9)
        va, vb = _fresh(v), _fresh(v)
        v1, _, l1 = single(va, opt.init(va), x8, y, c, k)
        v2, _, l2 = sharded(vb, opt.init(vb), x8, y, c, k)
        assert float(l1) == pytest.approx(float(l2), abs=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(v1),
                        jax.tree_util.tree_leaves(v2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestMixCLI:
    def test_train_cli_with_mixing(self, tiny_imagefolder, tmp_path):
        """--mixup/--cutmix end-to-end on the flagship CLI: runs, writes
        artifacts, and the trajectory differs from the plain run."""
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )

        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "seed": 0, "dim": 16}, f)
        losses = {}
        for name, extra in (("plain", []),
                            ("mix", ["--mixup", "0.4", "--cutmix", "1.0"])):
            d = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_path,
                "--epochs", "1", "--k_folds", "2", "--save_dir", d,
                "--seed", "0", *extra,
            ])
            with open(os.path.join(d, "training_info.json")) as f:
                losses[name] = json.load(f)
            assert os.path.exists(os.path.join(d, "best_global_model.npz"))
        assert losses["plain"] != losses["mix"]
