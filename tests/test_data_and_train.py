"""Data pipeline + training engine tests on the synthetic ImageFolder."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
from heuristique_style_transfer_code_tpu.data.loader import HostLoader, load_image_staged
from heuristique_style_transfer_code_tpu.data.augment import (
    generate_transform_combinations,
    make_augment_fn,
)


class TestImageFolder:
    def test_discovery(self, tiny_imagefolder):
        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        assert idx.classes == ["fog", "rain", "snow", "sun"]
        assert len(idx) == 24
        assert idx.samples_per_class() == {c: 6 for c in idx.classes}

    def test_subset(self, tiny_imagefolder):
        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        sub = idx.subset([0, 5, 10])
        assert len(sub) == 3
        assert sub.classes == idx.classes


class TestHostLoader:
    def test_batch_shapes_and_padding(self, tiny_imagefolder):
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))  # 12 samples
        loader = HostLoader(idx.samples, batch_size=8, shuffle=False)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["image"].shape == (8, 256, 256, 3)
        assert batches[0]["n_valid"] == 8
        assert batches[1]["n_valid"] == 4
        assert (batches[1]["label"][4:] == -1).all()

    def test_staged_decode_matches_pil_pipeline(self, tiny_imagefolder):
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        arr = load_image_staged(idx.samples[0][0])
        assert arr.shape == (256, 256, 3) and arr.dtype == np.uint8


class TestAugment:
    def test_combination_product(self):
        combos = generate_transform_combinations(
            ["horizontal_flip", None], ["brightness", "grayscale", None]
        )
        assert len(combos) == 6

    @pytest.mark.parametrize(
        "combo",
        [
            (None, None),
            ("horizontal_flip", None),
            ("vertical_flip", "grayscale"),
            ("rotation", "brightness"),
            ("affine", "hue"),
            ("resized_crop", "saturation"),
            (None, "contrast"),
        ],
    )
    def test_each_transform_runs(self, combo):
        fn = make_augment_fn([combo])
        imgs = np.random.RandomState(0).randint(0, 256, (2, 256, 256, 3), dtype=np.uint8)
        out = fn(jnp.asarray(imgs), jnp.zeros(2, jnp.int32), jax.random.PRNGKey(0))
        assert out.shape == (2, 224, 224, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_flip_is_exact(self):
        fn = make_augment_fn([("horizontal_flip", None)])
        imgs = np.random.RandomState(0).randint(0, 256, (1, 256, 256, 3), dtype=np.uint8)
        out = np.asarray(
            fn(jnp.asarray(imgs), jnp.zeros(1, jnp.int32), jax.random.PRNGKey(0))
        )
        ident = make_augment_fn([(None, None)])
        base = np.asarray(
            ident(jnp.asarray(imgs), jnp.zeros(1, jnp.int32), jax.random.PRNGKey(0))
        )
        np.testing.assert_allclose(out, base[:, :, ::-1, :], atol=1e-6)

    def test_switch_dispatch(self):
        combos = [(None, None), ("horizontal_flip", None)]
        fn = make_augment_fn(combos)
        imgs = np.random.RandomState(0).randint(0, 256, (2, 256, 256, 3), dtype=np.uint8)
        imgs[1] = imgs[0]
        out = np.asarray(
            fn(jnp.asarray(imgs), jnp.asarray([0, 1], jnp.int32), jax.random.PRNGKey(0))
        )
        np.testing.assert_allclose(out[1], out[0][:, ::-1, :], atol=1e-6)


class TestTraining:
    def test_loss_decreases_and_learns(self, tiny_imagefolder):
        """End-to-end slice: tiny truncated model learns the synthetic classes."""
        from heuristique_style_transfer_code_tpu.config.schema import TruncatedResNetConfig
        from heuristique_style_transfer_code_tpu.train.factories import make_truncated_resnet50
        from heuristique_style_transfer_code_tpu.train.train_loop import evaluate

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        cfg = TruncatedResNetConfig(batch_size=8, lr=0.01, truncate_layer=5, dim=32)
        combos = [(None, None)]
        variables, opt_state, train_step, eval_step, _ = make_truncated_resnet50(
            jax.random.PRNGKey(0), cfg, 4, combos
        )
        loader = HostLoader(idx.samples, 8, shuffle=True, seed=0)
        key = jax.random.PRNGKey(1)
        losses = []
        for epoch in range(4):
            for batch in loader:
                key, sub = jax.random.split(key)
                variables, opt_state, loss = train_step(
                    variables, opt_state, batch["image"], batch["label"], batch["combo"], sub
                )
                losses.append(float(loss))
        # SGD is noisy on 24 samples: compare epoch means, not endpoints
        k = len(losses) // 4
        assert np.mean(losses[-k:]) < np.mean(losses[:k])
        res = evaluate(eval_step, variables, HostLoader(idx.samples, 8), 4)
        assert res["val_accuracy"] >= 0.5  # classes are mean-separable

    def test_kfold_artifacts(self, tiny_imagefolder, tmp_path):
        from heuristique_style_transfer_code_tpu.config.schema import TruncatedResNetConfig
        from heuristique_style_transfer_code_tpu.train.factories import make_truncated_resnet50
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        cfg = TruncatedResNetConfig(batch_size=8, lr=0.01, truncate_layer=4, dim=16, seed=0)
        save_dir = str(tmp_path / "out")
        combos = [(None, None)]

        def init_fn(key, fold):
            v, o, ts, es, _ = make_truncated_resnet50(key, cfg, 4, combos)
            return v, o, ts, es

        info = run_kfold(
            idx,
            k_folds=2,
            seed=0,
            epochs=1,
            batch_size=8,
            save_dir=save_dir,
            hyperparameters=cfg.to_dict(),
            init_fn=init_fn,
            verbose_batches=False,
        )
        assert len(info["fold_results"]) == 2
        assert "average_results" in info
        for fname in (
            "training_info.json",
            "best_model_results.json",
            "fold_0_performance.json",
            "fold_1_performance.json",
            "best_global_model.npz",
            "best_global_model_hyperparameters.json",
        ):
            assert os.path.exists(os.path.join(save_dir, fname)), fname
        with open(os.path.join(save_dir, "training_info.json")) as f:
            ti = json.load(f)
        assert ti["num_classes"] == 4 and ti["class_names"] == ["fog", "rain", "snow", "sun"]


class TestCheckpointIO:
    def test_npz_roundtrip(self, tmp_path):
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
            save_pytree_npz,
        )

        tree = {
            "a": {"kernel": np.ones((2, 3)), "bias": np.zeros(3)},
            "blocks": [{"w": np.full((2,), 7.0), "norm": None}, {"w": np.ones(1), "norm": None}],
        }
        p = str(tmp_path / "ckpt.npz")
        save_pytree_npz(tree, p)
        back = load_pytree_npz(p, as_jax=False)
        assert back["blocks"][0]["norm"] is None
        np.testing.assert_array_equal(back["a"]["kernel"], tree["a"]["kernel"])
        np.testing.assert_array_equal(back["blocks"][0]["w"], tree["blocks"][0]["w"])
