"""LR schedules + gradient clipping (train/schedules.py, optim clip_norm).

The defaults are the reference's exact fixed-LR SGD; these tests pin the
additive paths: schedule shapes, schedule-driven update magnitudes through
the masked optimiser, global-norm clipping over the trainable leaves, and
the CLI wiring end-to-end.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
from heuristique_style_transfer_code_tpu.train.schedules import (
    make_lr_schedule,
    steps_per_fold,
)


class TestScheduleShapes:
    def test_constant_no_warmup_is_identity(self):
        assert make_lr_schedule("constant", 0.1, 100) is None

    def test_warmup_then_cosine(self):
        s = make_lr_schedule("cosine", 0.1, 100, warmup_steps=10, min_lr_ratio=0.1)
        assert float(s(0)) == 0.0
        np.testing.assert_allclose(float(s(5)), 0.05, rtol=1e-6)
        np.testing.assert_allclose(float(s(10)), 0.1, rtol=1e-6)
        # midpoint of the cosine: (peak + floor) / 2
        np.testing.assert_allclose(float(s(55)), (0.1 + 0.01) / 2, rtol=1e-5)
        np.testing.assert_allclose(float(s(100)), 0.01, rtol=1e-5)
        # never rises again past the end
        assert float(s(1000)) <= 0.01 + 1e-9

    def test_linear_decay(self):
        s = make_lr_schedule("linear", 1.0, 20, warmup_steps=0, min_lr_ratio=0.5)
        np.testing.assert_allclose(float(s(0)), 1.0, rtol=1e-6)
        np.testing.assert_allclose(float(s(10)), 0.75, rtol=1e-6)
        np.testing.assert_allclose(float(s(20)), 0.5, rtol=1e-6)

    def test_warmup_constant(self):
        s = make_lr_schedule("constant", 0.2, 50, warmup_steps=4)
        np.testing.assert_allclose(float(s(2)), 0.1, rtol=1e-6)
        np.testing.assert_allclose(float(s(30)), 0.2, rtol=1e-6)

    def test_validation(self):
        with pytest.raises(ValueError):
            make_lr_schedule("polynomial", 0.1, 10)
        with pytest.raises(ValueError):
            make_lr_schedule("cosine", 0.1, 10, min_lr_ratio=2.0)

    def test_steps_per_fold(self):
        # 24 samples, 2 folds -> 12 train; batch 5 -> 3 steps/epoch
        assert steps_per_fold(24, 2, 5, epochs=4) == 12
        assert steps_per_fold(10, 1, 4, epochs=2) == 6  # no CV split


def _tree(x):
    return {"w": jnp.asarray(x, jnp.float32), "bn": {"mean": jnp.zeros(2)}}


class TestMaskedOptimizerIntegration:
    def test_schedule_drives_update_magnitude(self):
        """With momentum 0 the SGD step is -lr(count) * g: consecutive
        updates must scale exactly like the schedule."""
        variables = _tree([1.0, 2.0])
        sched = make_lr_schedule("linear", 1.0, 4, min_lr_ratio=0.0)
        opt = sgd_momentum(sched, variables, momentum=0.0)
        state = opt.init(variables)
        g = {"w": jnp.asarray([1.0, 1.0]), "bn": {"mean": jnp.zeros(2)}}
        deltas = []
        for _ in range(3):
            upd, state = opt.update(g, state, variables)
            deltas.append(float(-upd["w"][0]))
        np.testing.assert_allclose(deltas, [float(sched(i)) for i in range(3)],
                                   rtol=1e-6)

    def test_clip_by_global_norm_over_trainable_leaves(self):
        """A gradient of global norm 10 clipped to 1: the update equals
        -lr * g / 10, and the frozen BN leaf stays untouched."""
        variables = _tree([0.0, 0.0])
        opt = sgd_momentum(0.5, variables, momentum=0.0, clip_norm=1.0)
        state = opt.init(variables)
        g = {"w": jnp.asarray([6.0, 8.0]), "bn": {"mean": jnp.ones(2)}}
        upd, _ = opt.update(g, state, variables)
        np.testing.assert_allclose(
            np.asarray(upd["w"]), [-0.5 * 0.6, -0.5 * 0.8], rtol=1e-6
        )
        np.testing.assert_allclose(np.asarray(upd["bn"]["mean"]), 0.0)

    def test_small_gradients_not_clipped(self):
        variables = _tree([0.0, 0.0])
        plain = sgd_momentum(0.5, variables, momentum=0.0)
        clipped = sgd_momentum(0.5, variables, momentum=0.0, clip_norm=100.0)
        g = {"w": jnp.asarray([0.3, 0.4]), "bn": {"mean": jnp.zeros(2)}}
        u1, _ = plain.update(g, plain.init(variables), variables)
        u2, _ = clipped.update(g, clipped.init(variables), variables)
        np.testing.assert_allclose(np.asarray(u1["w"]), np.asarray(u2["w"]),
                                   rtol=1e-7)

    def test_default_state_structure_unchanged(self):
        """No schedule, no clip: the optimiser state must keep the exact
        plain-SGD structure (resume back-compat)."""
        variables = _tree([1.0])
        a = sgd_momentum(0.1, variables)
        b = sgd_momentum(0.1, variables, clip_norm=None)
        sa = jax.tree_util.tree_structure(a.init(variables))
        sb = jax.tree_util.tree_structure(b.init(variables))
        assert sa == sb


class TestScheduleCLI:
    def test_train_cli_with_schedule_and_clip(self, tiny_imagefolder, tmp_path,
                                              capsys):
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )

        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                       "seed": 0, "dim": 16}, f)
        models = str(tmp_path / "m")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_path,
            "--epochs", "2", "--k_folds", "2", "--save_dir", models,
            "--seed", "0",
            "--lr_schedule", "cosine", "--warmup_steps", "2",
            "--min_lr_ratio", "0.1", "--clip_grad_norm", "5.0",
        ])
        assert os.path.exists(os.path.join(models, "best_global_model.npz"))
        out = capsys.readouterr().out
        assert "lr schedule" in out  # the CLI reports the resolved horizon

    def test_schedule_changes_training(self, tiny_imagefolder, tmp_path):
        """The schedule must actually reach the jitted step: final weights
        differ from the fixed-lr run."""
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
            ("sched", ["--lr_schedule", "linear", "--min_lr_ratio", "0.0"]),
        ):
            d = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_path,
                "--epochs", "1", "--k_folds", "2", "--save_dir", d,
                "--seed", "0", *extra,
            ])
            tree = load_pytree_npz(os.path.join(d, "best_global_model.npz"),
                                   as_jax=False)
            runs[name] = jax.tree_util.tree_leaves(tree)
        diffs = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(runs["plain"], runs["sched"])
        ]
        assert max(diffs) > 0.0
