"""Gradient accumulation (train_loop.make_train_step_accum): exact
full-batch equivalence for stat-free models, eager-reference equality for
BatchNorm (ghost-BN) models, CLI wiring."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
from heuristique_style_transfer_code_tpu.train.train_loop import (
    _masked_nll_parts,
    make_train_step,
    make_train_step_accum,
)

CROP = 32


def _batch(b, seed=0, n_pad=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randint(0, 256, (b, 40, 40, 3), dtype=np.uint8))
    labels = rng.randint(0, 2, (b,)).astype(np.int32)
    if n_pad:  # pads land unevenly across micro-batches on purpose
        labels[rng.choice(b, n_pad, replace=False)] = -1
    combos = jnp.asarray((np.arange(b) % 2).astype(np.int32))
    return images, jnp.asarray(labels), combos


class TestExactEquivalence:
    @pytest.mark.parametrize("n_pad", [0, 3])
    def test_matches_full_batch_step_stat_free(self, n_pad):
        """Linear model (no batch statistics): accumulated loss AND updated
        parameters equal the plain full-batch step up to f32 reassociation —
        including unevenly distributed pad entries, which break naive
        mean-of-means accumulation."""

        def fwd(v, images):
            flat = images.reshape(images.shape[0], -1)
            return flat @ v["w"] + v["b"], None

        dim = CROP * CROP * 3
        k = jax.random.PRNGKey(0)
        variables = {
            "w": jax.random.normal(k, (dim, 2), jnp.float32) * 0.01,
            "b": jnp.zeros((2,), jnp.float32),
        }
        opt = sgd_momentum(0.05, variables)
        augment = make_augment_fn(
            [(None, None), ("horizontal_flip", None)], crop=CROP
        )
        images, labels, combos = _batch(8, n_pad=n_pad)
        key = jax.random.PRNGKey(3)

        plain = make_train_step(fwd, opt, augment)
        v_a, o_a, loss_a = plain(
            jax.tree_util.tree_map(jnp.array, variables),
            opt.init(variables), images, labels, combos, key,
        )
        for n_accum in (2, 4):
            accum = make_train_step_accum(fwd, opt, augment, n_accum)
            v_b, o_b, loss_b = accum(
                jax.tree_util.tree_map(jnp.array, variables),
                opt.init(variables), images, labels, combos, key,
            )
            np.testing.assert_allclose(
                float(loss_b), float(loss_a), rtol=1e-6
            )
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
                ),
                v_a, v_b,
            )

    def test_mesh_sharded_accum_matches_unsharded(self):
        """Batch-sharding the accumulation step over the 8-device mesh is a
        layout, not a semantics change (micro-batches shard over 'data')."""
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_2d,
        )

        def fwd(v, images):
            flat = images.reshape(images.shape[0], -1)
            return flat @ v["w"] + v["b"], None

        dim = CROP * CROP * 3
        k = jax.random.PRNGKey(1)
        variables = {
            "w": jax.random.normal(k, (dim, 2), jnp.float32) * 0.01,
            "b": jnp.zeros((2,), jnp.float32),
        }
        opt = sgd_momentum(0.05, variables)
        augment = make_augment_fn([(None, None)], crop=CROP)
        images, labels, combos = _batch(16, seed=2, n_pad=2)
        key = jax.random.PRNGKey(4)

        plain = make_train_step_accum(fwd, opt, augment, 4)
        v_a, _, loss_a = plain(
            jax.tree_util.tree_map(jnp.array, variables),
            opt.init(variables), images, labels, combos, key,
        )
        mesh = make_mesh_2d(8)
        sharded = make_train_step_accum(fwd, opt, augment, 4, mesh=mesh)
        v_b, _, loss_b = sharded(
            jax.tree_util.tree_map(jnp.array, variables),
            opt.init(variables), images, labels, combos, key,
        )
        np.testing.assert_allclose(float(loss_b), float(loss_a), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            v_a, v_b,
        )

    def test_all_pad_batch_is_finite(self):
        def fwd(v, images):
            return images.reshape(images.shape[0], -1) @ v["w"], None

        variables = {"w": jnp.ones((CROP * CROP * 3, 2), jnp.float32)}
        opt = sgd_momentum(0.05, variables)
        augment = make_augment_fn([(None, None)], crop=CROP)
        images, labels, combos = _batch(4)
        accum = make_train_step_accum(fwd, opt, augment, 2)
        v, o, loss = accum(
            variables, opt.init(variables), images,
            jnp.full_like(labels, -1), combos, jax.random.PRNGKey(0),
        )
        assert np.isfinite(float(loss))

    def test_indivisible_batch_rejected(self):
        def fwd(v, images):
            return images.reshape(images.shape[0], -1) @ v["w"], None

        variables = {"w": jnp.ones((CROP * CROP * 3, 2), jnp.float32)}
        opt = sgd_momentum(0.05, variables)
        augment = make_augment_fn([(None, None)], crop=CROP)
        images, labels, combos = _batch(6)
        accum = make_train_step_accum(fwd, opt, augment, 4)
        with pytest.raises(ValueError, match="not divisible"):
            accum(variables, opt.init(variables), images, labels, combos,
                  jax.random.PRNGKey(0))


class TestGhostBatchNorm:
    def test_matches_eager_micro_batch_reference(self):
        """BatchNorm model: the scanned accumulation equals an eagerly
        written micro-batch loop — same per-micro batch statistics, chained
        running stats, summed unnormalised grads, one optimiser update."""
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.train.optim import (
            BN_STAT_KEYS,
            _leaf_name,
        )

        truncate, n_accum = 4, 2
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, truncate, dim=8),
            "classifier": classifier_init(k2, 8, 2),
        }

        def fwd(v, images):
            logits, new_moco = combined_apply(
                v["moco"], v["classifier"], images, truncate, train=True
            )
            return logits, {"moco": new_moco, "classifier": v["classifier"]}

        opt = sgd_momentum(0.01, variables)
        augment = make_augment_fn([(None, None)], crop=CROP)
        images, labels, combos = _batch(4, seed=5)
        key = jax.random.PRNGKey(9)

        accum = make_train_step_accum(fwd, opt, augment, n_accum)
        v_got, _, loss_got = accum(
            jax.tree_util.tree_map(jnp.array, variables),
            opt.init(variables), images, labels, combos, key,
        )

        # eager reference
        aug = augment(images, combos, key)
        mb = aug.shape[0] // n_accum
        flat, _ = jax.tree_util.tree_flatten_with_path(variables)
        stat_idx = [i for i, (p, _) in enumerate(flat)
                    if _leaf_name(p) in BN_STAT_KEYS]

        def insert(tree, stat_leaves):
            leaves = list(jax.tree_util.tree_leaves(tree))
            for i, leaf in zip(stat_idx, stat_leaves):
                leaves[i] = leaf
            return jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(tree), leaves
            )

        stats = [jax.tree_util.tree_leaves(variables)[i] for i in stat_idx]
        g_sum = jax.tree_util.tree_map(jnp.zeros_like, variables)
        nll_sum, cnt_sum = 0.0, 0.0
        for m in range(n_accum):
            im, lb = aug[m * mb:(m + 1) * mb], labels[m * mb:(m + 1) * mb]

            def nll_fn(v, stats=stats, im=im, lb=lb):
                logits, new_v = fwd(insert(v, stats), im)
                nll, cnt = _masked_nll_parts(logits, lb)
                return nll, (cnt, new_v)

            (nll, (cnt, new_v)), g = jax.value_and_grad(
                nll_fn, has_aux=True
            )(variables)
            stats = [jax.tree_util.tree_leaves(new_v)[i] for i in stat_idx]
            g_sum = jax.tree_util.tree_map(jnp.add, g_sum, g)
            nll_sum, cnt_sum = nll_sum + nll, cnt_sum + cnt
        denom = jnp.maximum(cnt_sum, 1.0)
        import optax

        updates, _ = opt.update(
            jax.tree_util.tree_map(lambda g: g / denom, g_sum),
            opt.init(variables), variables,
        )
        v_ref = insert(optax.apply_updates(variables, updates), stats)

        np.testing.assert_allclose(
            float(loss_got), float(nll_sum / denom), rtol=1e-6
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            v_got, v_ref,
        )


class TestCLI:
    def test_cli_trains_with_grad_accum(self, tmp_path):
        import json

        from PIL import Image

        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )

        rng = np.random.RandomState(0)
        for cls in ("a", "b"):
            d = tmp_path / "train" / cls
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(
                    rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
                ).save(str(d / f"{i}.png"))
        cfg = tmp_path / "cfg.json"
        cfg.write_text(json.dumps({
            "batch_size": 4, "lr": 0.01, "truncate_layer": 4,
            "seed": 0, "dim": 8,
        }))
        save = tmp_path / "models"
        main([
            "--data", str(tmp_path), "--config_path", str(cfg),
            "--epochs", "1", "--k_folds", "2", "--save_dir", str(save),
            "--seed", "0", "--grad_accum", "2",
        ])
        assert (save / "best_global_model.npz").exists()

    def test_cli_rejects_bad_combinations(self, tmp_path):
        import json

        from heuristique_style_transfer_code_tpu.cli._common import (
            apply_grad_accum,
        )

        class Args:
            grad_accum = 3
            steps_per_dispatch = 1
            parallel_folds = False

        with pytest.raises(SystemExit, match="does not divide"):
            apply_grad_accum(Args(), None, 4)
        Args.grad_accum, Args.steps_per_dispatch = 2, 4
        with pytest.raises(SystemExit, match="exclusive"):
            apply_grad_accum(Args(), None, 4)
        Args.steps_per_dispatch, Args.parallel_folds = 1, True
        with pytest.raises(SystemExit, match="exclusive"):
            apply_grad_accum(Args(), None, 4)

    def test_grad_accum_is_part_of_the_resume_signature(self):
        """--grad_accum changes numerics (ghost-BN micro-batch statistics),
        so resuming under a different K must be rejected by the run
        signature — while plain runs keep their historical signature."""
        from heuristique_style_transfer_code_tpu.cli._common import (
            signature_extra_from_args,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import (
            _run_signature,
        )

        class Args:
            grad_accum = 4

        class Plain:
            grad_accum = 1

        base = _run_signature(0, 2, 1, 0, {"lr": 0.01})
        plain = _run_signature(
            0, 2, 1, 0, {"lr": 0.01}, signature_extra_from_args(Plain())
        )
        accum = _run_signature(
            0, 2, 1, 0, {"lr": 0.01}, signature_extra_from_args(Args())
        )
        assert plain == base  # K=1 leaves signatures unchanged (back-compat)
        assert accum != base
        assert "grad_accum" in accum

    def test_precision_and_augmentation_join_the_signature(self):
        """--precision and the augmentation selection change numerics /
        batch structure, so they are part of the run identity too; defaults
        keep the historical signature (back-compat)."""
        from heuristique_style_transfer_code_tpu.cli._common import (
            signature_extra_from_args,
        )

        class Defaults:
            grad_accum = 1
            precision = "float32"
            color_aug = False
            geom_aug = False
            num_color_transforms = 0
            num_geom_transforms = 0
            geom_transforms = None

        class Bf16Aug(Defaults):
            precision = "bf16"
            color_aug = True
            num_color_transforms = 2

        assert signature_extra_from_args(Defaults()) is None
        extra = signature_extra_from_args(Bf16Aug())
        assert extra == {
            "precision": "bf16", "color_aug": True, "num_color_transforms": 2
        }
