"""EMA weight averaging for evaluation (train/optim.param_ema,
run_kfold(eval_variables_fn=), --ema_decay).

Additive TPU extra: the EMA rides the optimiser state (so every step
variant, checkpoint and resume path carries it unchanged); evaluation and
fold artifacts use the EMA tree with live BN statistics.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.train.optim import (
    extract_ema_variables,
    find_ema_state,
    param_ema,
    sgd_momentum,
)


def _tree(w):
    return {"w": jnp.asarray(w, jnp.float32), "bn": {"mean": jnp.zeros(2)}}


class TestParamEma:
    def test_tracks_post_update_params(self):
        """momentum=0, lr=1: params after step k are p - sum(g); the EMA must
        equal the hand-rolled recurrence over POST-update params."""
        decay = 0.75
        variables = _tree([1.0, 2.0])
        opt = sgd_momentum(1.0, variables, momentum=0.0, ema_decay=decay)
        state = opt.init(variables)
        g = {"w": jnp.asarray([0.5, -0.5]), "bn": {"mean": jnp.zeros(2)}}

        p = np.array([1.0, 2.0])
        ema = p.copy()  # init ema = init params
        v = variables
        for _ in range(3):
            upd, state = opt.update(g, state, v)
            import optax

            v = optax.apply_updates(v, upd)
            p = p - np.array([0.5, -0.5])
            ema = decay * ema + (1 - decay) * p
            np.testing.assert_allclose(
                np.asarray(find_ema_state(state).ema["w"]), ema, rtol=1e-6
            )

    def test_extraction_keeps_live_bn_stats(self):
        variables = _tree([1.0, 1.0])
        opt = sgd_momentum(0.5, variables, momentum=0.0, ema_decay=0.9)
        state = opt.init(variables)
        g = {"w": jnp.ones(2), "bn": {"mean": jnp.zeros(2)}}
        upd, state = opt.update(g, state, variables)
        import optax

        v = optax.apply_updates(variables, upd)
        # simulate the forward's BN-stat merge moving the running stats
        v["bn"]["mean"] = jnp.full((2,), 7.0)
        out = extract_ema_variables(v, state)
        np.testing.assert_array_equal(np.asarray(out["bn"]["mean"]), 7.0)
        # trainable leaf comes from the EMA, not the live params
        assert not np.allclose(np.asarray(out["w"]), np.asarray(v["w"]))

    def test_no_ema_is_structurally_identical(self):
        variables = _tree([1.0])
        a = sgd_momentum(0.1, variables)
        b = sgd_momentum(0.1, variables, ema_decay=None)
        assert jax.tree_util.tree_structure(
            a.init(variables)
        ) == jax.tree_util.tree_structure(b.init(variables))
        assert find_ema_state(a.init(variables)) is None
        # identity extraction without an EMA
        out = extract_ema_variables(variables, a.init(variables))
        assert out is variables

    def test_decay_validation(self):
        with pytest.raises(ValueError):
            param_ema(1.0)
        with pytest.raises(ValueError):
            param_ema(0.0)


def _tiny_dataset(tmp_path):
    from PIL import Image

    from heuristique_style_transfer_code_tpu.data.imagefolder import (
        ImageFolderIndex,
    )

    rng = np.random.RandomState(0)
    root = tmp_path / "data" / "train"
    for cls in ("a", "b"):
        d = root / cls
        d.mkdir(parents=True)
        for i in range(6):
            Image.fromarray(
                rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(str(d / f"{i}.png"))
    return ImageFolderIndex(str(root))


def _linear_init_fn(lr=0.05, ema_decay=None):
    from heuristique_style_transfer_code_tpu.data.augment import (
        make_augment_fn,
    )
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
        opt = sgd_momentum(lr, variables, ema_decay=ema_decay)
        augment = make_augment_fn([(None, None)], crop=32)
        return (
            variables,
            opt.init(variables),
            make_train_step(fwd, opt, augment),
            make_eval_step(lambda v, x: fwd(v, x)[0], crop=32),
        )

    return init_fn


def _run(dataset, save_dir, ema_decay=None, resume=False, interrupt=None):
    from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

    return run_kfold(
        dataset,
        k_folds=2, seed=7, epochs=3, batch_size=4, save_dir=save_dir,
        hyperparameters={"lr": 0.05},
        init_fn=_linear_init_fn(ema_decay=ema_decay),
        eval_variables_fn=extract_ema_variables if ema_decay else None,
        verbose_batches=False, num_workers=2, resume=resume,
        _interrupt_after=interrupt,
    )


class TestEmaKFold:
    def test_tiny_decay_reproduces_plain_artifacts(self, tmp_path):
        """decay -> 0 makes the EMA track the live weights: the saved model
        must match a plain run to float tolerance — pins that the EMA path
        changes ONLY the averaging, nothing else in the drive."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )

        dataset = _tiny_dataset(tmp_path)
        info_p = _run(dataset, str(tmp_path / "plain"))
        info_e = _run(dataset, str(tmp_path / "ema"), ema_decay=1e-9)
        a = load_pytree_npz(
            os.path.join(str(tmp_path / "plain"), "best_global_model.npz")
        )
        b = load_pytree_npz(
            os.path.join(str(tmp_path / "ema"), "best_global_model.npz")
        )
        for k in a:
            np.testing.assert_allclose(
                np.asarray(a[k]), np.asarray(b[k]), atol=1e-6
            )
        for ra, rb in zip(info_p["fold_results"], info_e["fold_results"]):
            assert ra["val_loss"] == pytest.approx(rb["val_loss"], abs=1e-5)

    def test_heavy_decay_stays_near_init(self, tmp_path):
        """decay ~ 1 keeps the EMA near the init: the saved weights must sit
        closer to the initial weights than the plain run's do."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )

        dataset = _tiny_dataset(tmp_path)
        _run(dataset, str(tmp_path / "plain"))
        _run(dataset, str(tmp_path / "ema"), ema_decay=0.999)
        plain = load_pytree_npz(
            os.path.join(str(tmp_path / "plain"), "best_global_model.npz")
        )
        ema = load_pytree_npz(
            os.path.join(str(tmp_path / "ema"), "best_global_model.npz")
        )
        # training itself is identical in both runs (same keys/data), so the
        # saved-tree difference IS the averaging: heavy decay must visibly
        # lag the live weights
        dw = np.abs(np.asarray(ema["w"]) - np.asarray(plain["w"])).max()
        assert dw > 1e-6

    def test_resume_bit_identical_with_ema(self, tmp_path):
        """The EMA rides the optimiser-state leaves of the in-progress
        checkpoint: interrupted+resumed == uninterrupted, bit for bit."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )

        dataset = _tiny_dataset(tmp_path)
        straight = str(tmp_path / "straight")
        info_a = _run(dataset, straight, ema_decay=0.9, resume=True)

        resumed = str(tmp_path / "resumed")
        with pytest.raises(RuntimeError, match="test seam"):
            _run(dataset, resumed, ema_decay=0.9, resume=True,
                 interrupt=(0, 1))
        info_b = _run(dataset, resumed, ema_decay=0.9, resume=True)

        assert info_a["fold_results"] == info_b["fold_results"]
        a = load_pytree_npz(os.path.join(straight, "best_global_model.npz"))
        b = load_pytree_npz(os.path.join(resumed, "best_global_model.npz"))
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestEmaCLI:
    def test_train_cli_with_ema(self, tiny_imagefolder, tmp_path):
        """--ema_decay end-to-end on the flagship CLI: runs, writes
        artifacts, and the saved weights differ from the plain run (the BN
        stat leaves must still be the live ones — finite and touched)."""
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
        trees = {}
        for name, extra in (("plain", []), ("ema", ["--ema_decay", "0.9"])):
            d = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_path,
                "--epochs", "2", "--k_folds", "2", "--save_dir", d,
                "--seed", "0", *extra,
            ])
            trees[name] = load_pytree_npz(
                os.path.join(d, "best_global_model.npz"), as_jax=False
            )
        pw = jax.tree_util.tree_leaves_with_path(trees["plain"])
        ew = dict(
            (jax.tree_util.keystr(p), v)
            for p, v in jax.tree_util.tree_leaves_with_path(trees["ema"])
        )
        diffs, stat_equal = [], []
        for path, v in pw:
            key = jax.tree_util.keystr(path)
            d = float(np.abs(np.asarray(v) - np.asarray(ew[key])).max())
            leaf = key.rsplit("'", 2)[-2] if "'" in key else key
            if leaf in ("mean", "var"):
                stat_equal.append(d)
            else:
                diffs.append(d)
        assert max(diffs) > 1e-5  # EMA changed the saved trainable weights
        # BN running stats are the LIVE ones — same training trajectory in
        # both runs (EMA passes updates through untouched); tolerance covers
        # fusion-level reassociation between the two compiled programs
        assert max(stat_equal) < 1e-5
