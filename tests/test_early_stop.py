"""Early stopping (train/early_stop.py, run_kfold(early_stop=)) and label
smoothing (train_loop label_smoothing, --label_smoothing).

Both are additive TPU extras over the reference's fixed protocol
(train_best_RESNET50_Truncate.py:205-233 trains every fold the full budget
and evaluates once); defaults keep reference semantics exactly.
"""
import json
import os
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.train.early_stop import EarlyStopper
from heuristique_style_transfer_code_tpu.train.train_loop import (
    masked_cross_entropy,
)


class TestEarlyStopper:
    def test_stop_after_patience_without_improvement(self):
        s = EarlyStopper(patience=2)
        v = lambda x: {"w": np.full((2,), x)}  # noqa: E731
        assert s.update(1.0, v(0), 0) is False
        assert s.update(0.9, v(1), 1) is False   # improves
        assert s.update(0.95, v(2), 2) is False  # 1 bad epoch
        assert s.update(0.92, v(3), 3) is True   # 2 bad epochs -> stop
        assert s.best_epoch == 1
        np.testing.assert_array_equal(s.best_variables["w"], 1.0)

    def test_improvement_resets_counter(self):
        s = EarlyStopper(patience=2)
        seq = [1.0, 1.1, 0.8, 0.9, 0.85]  # bad, improve, bad, bad -> stop
        stops = [s.update(x, {"w": np.zeros(1)}, i) for i, x in enumerate(seq)]
        assert stops == [False, False, False, False, True]
        assert s.best_loss == 0.8 and s.best_epoch == 2

    def test_strict_improvement(self):
        s = EarlyStopper(patience=1)
        assert s.update(1.0, {"w": np.zeros(1)}, 0) is False
        assert s.update(1.0, {"w": np.ones(1)}, 1) is True  # equal != better
        np.testing.assert_array_equal(s.best_variables["w"], 0.0)

    def test_counters_roundtrip(self):
        a = EarlyStopper(patience=3)
        a.update(1.0, {"w": np.zeros(1)}, 0)
        a.update(1.2, {"w": np.ones(1)}, 1)
        b = EarlyStopper(patience=3)
        b.restore(a.state_leaves(), a.best_variables)
        assert (b.best_loss, b.since, b.best_epoch) == (1.0, 1, 0)

    def test_validation(self):
        with pytest.raises(ValueError):
            EarlyStopper(patience=0)


class TestLabelSmoothing:
    def test_matches_torch_cross_entropy(self):
        """torch.nn.functional.cross_entropy(label_smoothing=eps) parity,
        with a pad entry (-1) masked out on our side."""
        import torch
        import torch.nn.functional as F

        rng = np.random.RandomState(3)
        logits = rng.randn(9, 5).astype(np.float32)
        labels = np.array([0, 4, 2, 1, 3, 0, 2, 4, -1])
        for eps in (0.0, 0.1, 0.37):
            ours = float(
                masked_cross_entropy(
                    jnp.asarray(logits), jnp.asarray(labels),
                    label_smoothing=eps,
                )
            )
            ref = float(
                F.cross_entropy(
                    torch.from_numpy(logits[:8]),
                    torch.from_numpy(labels[:8]),
                    label_smoothing=eps,
                )
            )
            np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_zero_is_identity(self):
        rng = np.random.RandomState(5)
        logits = jnp.asarray(rng.randn(4, 3).astype(np.float32))
        labels = jnp.asarray([0, 1, 2, -1])
        a = masked_cross_entropy(logits, labels)
        b = masked_cross_entropy(logits, labels, label_smoothing=0.0)
        assert float(a) == float(b)

    def test_accum_step_matches_plain_with_smoothing(self):
        """label_smoothing must thread through the grad-accumulation step:
        a stat-free model's accum(2) step equals the plain step."""
        from heuristique_style_transfer_code_tpu.data.augment import (
            make_augment_fn,
        )
        from heuristique_style_transfer_code_tpu.train.optim import (
            sgd_momentum,
        )
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_train_step,
            make_train_step_accum,
        )

        def fwd(v, images):
            return images.reshape(images.shape[0], -1) @ v["w"], v

        key = jax.random.PRNGKey(0)
        variables = {
            "w": jax.random.normal(key, (32 * 32 * 3, 3), jnp.float32) * 0.01
        }
        opt = sgd_momentum(0.1, variables)
        augment = make_augment_fn([(None, None)], crop=32)
        images = np.random.RandomState(0).randint(
            0, 256, (4, 32, 32, 3), np.uint8
        )
        labels = np.array([0, 2, 1, -1])
        combos = np.zeros(4, np.int32)
        args = (images, labels, combos, jax.random.PRNGKey(7))

        outs = []
        for maker in (
            lambda: make_train_step(fwd, opt, augment, label_smoothing=0.2),
            lambda: make_train_step_accum(
                fwd, opt, augment, 2, label_smoothing=0.2
            ),
        ):
            v = jax.tree_util.tree_map(jnp.array, variables)
            nv, _, loss = maker()(v, opt.init(variables), *args)
            outs.append((np.asarray(nv["w"]), float(loss)))
        np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-6)
        np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-6)


def _tiny_dataset(tmp_path, n_per_class=6, classes=("a", "b")):
    from PIL import Image

    from heuristique_style_transfer_code_tpu.data.imagefolder import (
        ImageFolderIndex,
    )

    rng = np.random.RandomState(0)
    root = tmp_path / "data" / "train"
    for cls in classes:
        d = root / cls
        d.mkdir(parents=True)
        for i in range(n_per_class):
            Image.fromarray(
                rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(str(d / f"{i}.png"))
    return ImageFolderIndex(str(root))


def _linear_init_fn(lr=0.05):
    from heuristique_style_transfer_code_tpu.data.augment import (
        make_augment_fn,
    )
    from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
    from heuristique_style_transfer_code_tpu.train.train_loop import (
        make_eval_step,
        make_train_step,
    )

    def fwd(v, images):
        return images.reshape(images.shape[0], -1) @ v["w"] + v["b"], v

    def init_fn(key, fold):
        variables = {
            "w": jax.random.normal(key, (32 * 32 * 3, 2), jnp.float32) * 0.01,
            "b": jnp.zeros((2,), jnp.float32),
        }
        opt = sgd_momentum(lr, variables)
        augment = make_augment_fn([(None, None)], crop=32)
        return (
            variables,
            opt.init(variables),
            make_train_step(fwd, opt, augment),
            make_eval_step(lambda v, x: fwd(v, x)[0], crop=32),
        )

    return init_fn


class TestEarlyStopKFold:
    def test_diverging_run_stops_and_keeps_best(self, tmp_path, capsys):
        """A huge LR makes val loss blow up after epoch 1: patience 1 must
        stop every fold early, and the fold-end metrics (computed on the
        restored best-epoch weights) must equal the best per-epoch
        validation loss seen."""
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        dataset = _tiny_dataset(tmp_path)
        info = run_kfold(
            dataset,
            k_folds=2, seed=7, epochs=5, batch_size=4,
            save_dir=str(tmp_path / "m"), hyperparameters={"lr": 50.0},
            init_fn=_linear_init_fn(lr=50.0), verbose_batches=False,
            num_workers=2, early_stop=1,
        )
        out = capsys.readouterr().out
        assert "early stop after epoch" in out
        for fold in (0, 1):
            vals = [
                float(m)
                for m in re.findall(
                    rf"Fold {fold}, Validation Loss: ([0-9.]+)", out
                )
            ]
            # per-epoch evaluations + the fold-end one on restored weights
            assert len(vals) >= 2
            assert vals[-1] == min(vals[:-1])
            assert info["fold_results"][fold]["val_loss"] == pytest.approx(
                min(vals[:-1]), abs=1e-4
            )
            # stopped early: strictly fewer per-epoch evals than epochs
            assert len(vals) - 1 < 5

    def test_full_run_still_keeps_best_epoch(self, tmp_path, capsys):
        """Patience >= epochs never triggers a stop, but fold artifacts must
        still describe the best epoch (restore-best doubles as checkpoint
        selection)."""
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        dataset = _tiny_dataset(tmp_path)
        info = run_kfold(
            dataset,
            k_folds=2, seed=7, epochs=3, batch_size=4,
            save_dir=str(tmp_path / "m"), hyperparameters={"lr": 0.05},
            init_fn=_linear_init_fn(), verbose_batches=False,
            num_workers=2, early_stop=10,
        )
        out = capsys.readouterr().out
        assert "early stop after epoch" not in out
        for fold in (0, 1):
            vals = [
                float(m)
                for m in re.findall(
                    rf"Fold {fold}, Validation Loss: ([0-9.]+)", out
                )
            ]
            assert len(vals) == 3 + 1  # every epoch + fold end
            assert vals[-1] == min(vals[:-1])
            assert info["fold_results"][fold]["val_loss"] == pytest.approx(
                min(vals[:-1]), abs=1e-4
            )

    def test_resume_bit_identical_with_early_stop(self, tmp_path):
        """The early-stop counters and best snapshot ride the in-progress
        checkpoint: an interrupted+resumed run must match an uninterrupted
        one bit for bit (same stop epoch, same restored best weights)."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        dataset = _tiny_dataset(tmp_path)
        common = dict(
            k_folds=2, seed=7, epochs=4, batch_size=4,
            hyperparameters={"lr": 0.05}, init_fn=_linear_init_fn(),
            verbose_batches=False, num_workers=2, early_stop=2, resume=True,
        )

        straight = str(tmp_path / "straight")
        info_a = run_kfold(dataset, save_dir=straight, **common)

        resumed = str(tmp_path / "resumed")
        with pytest.raises(RuntimeError, match="test seam"):
            run_kfold(
                dataset, save_dir=resumed, _interrupt_after=(0, 1), **common
            )
        info_b = run_kfold(dataset, save_dir=resumed, **common)

        assert info_a["fold_results"] == info_b["fold_results"]
        a = load_pytree_npz(os.path.join(straight, "best_global_model.npz"))
        b = load_pytree_npz(os.path.join(resumed, "best_global_model.npz"))
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        # in-progress artifacts (incl. the best-weights side file) cleaned up
        for name in (
            "_inprogress_state.npz", "_inprogress_meta.json",
            "_inprogress_best.npz",
        ):
            assert not os.path.exists(os.path.join(resumed, name))

    def test_exclusive_with_fold_parallel(self, tmp_path):
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        dataset = _tiny_dataset(tmp_path, n_per_class=2)
        with pytest.raises(ValueError, match="exclusive"):
            run_kfold(
                dataset,
                k_folds=2, seed=0, epochs=1, batch_size=4,
                save_dir=str(tmp_path / "m"), hyperparameters={},
                init_fn=_linear_init_fn(), early_stop=1,
                foldwise_step=lambda *a: None, fold_mesh=object(),
            )


class TestCLI:
    def test_train_cli_early_stop_and_smoothing(self, tiny_imagefolder,
                                                tmp_path, capsys):
        """End-to-end: both flags reach the driver/step — the run completes,
        writes artifacts, and smoothing changes the trained weights."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )

        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "seed": 0, "dim": 16}, f)
        runs = {}
        for name, extra in (
            ("plain", []),
            ("smooth", ["--label_smoothing", "0.3", "--early_stop", "5"]),
        ):
            d = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_path,
                "--epochs", "2", "--k_folds", "2", "--save_dir", d,
                "--seed", "0", *extra,
            ])
            tree = load_pytree_npz(
                os.path.join(d, "best_global_model.npz"), as_jax=False
            )
            runs[name] = jax.tree_util.tree_leaves(tree)
        assert os.path.exists(os.path.join(str(tmp_path / "smooth"),
                                           "training_info.json"))
        diffs = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(runs["plain"], runs["smooth"])
        ]
        assert max(diffs) > 0.0

    def test_early_stop_excludes_parallel_folds(self, tiny_imagefolder,
                                                tmp_path):
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )

        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "seed": 0, "dim": 16}, f)
        with pytest.raises(SystemExit, match="exclusive"):
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_path,
                "--epochs", "1", "--k_folds", "2",
                "--save_dir", str(tmp_path / "m"), "--seed", "0",
                "--early_stop", "1", "--parallel_folds",
            ])
