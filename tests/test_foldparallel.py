"""Fold-parallel k-fold training (parallel/foldparallel.py): all CV folds as
one SPMD program over a (fold, data) mesh, equal per-fold trajectories to the
sequential driver (reference protocol: train_best_RESNET50_Truncate.py:146-258).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
    classifier_init,
    combined_apply,
    truncated_moco_init,
)
from heuristique_style_transfer_code_tpu.parallel.foldparallel import (
    make_fold_mesh,
    make_foldwise_train_step,
    stack_fold_states,
    unstack_fold_state,
)
from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
from heuristique_style_transfer_code_tpu.train.train_loop import make_train_step


def _tiny_family1(truncate=5, dim=16, num_classes=4):
    def init_fn(key):
        k1, k2 = jax.random.split(key)
        return {
            "moco": truncated_moco_init(k1, truncate, dim=dim),
            "classifier": classifier_init(k2, dim, num_classes),
        }

    def forward_train(v, images):
        logits, new_moco = combined_apply(
            v["moco"], v["classifier"], images, truncate, train=True
        )
        return logits, {"moco": new_moco, "classifier": v["classifier"]}

    return init_fn, forward_train


class TestFoldwiseStep:
    def test_matches_sequential_and_freezes_inactive(self):
        """Two folds stepped in one vmapped SPMD program: the active fold's
        trajectory equals the plain per-fold train step; the inactive fold's
        variables AND optimiser state pass through untouched (a zero-grad
        step would still move SGD momentum and BN running stats)."""
        init_fn, forward_train = _tiny_family1()
        optimizer = sgd_momentum(0.01, jax.eval_shape(init_fn, jax.random.PRNGKey(0)))
        augment = make_augment_fn([(None, None)], crop=64)

        keys = jax.random.split(jax.random.PRNGKey(0), 2)
        states = [init_fn(k) for k in keys]
        opts = [optimizer.init(v) for v in states]

        rng = np.random.RandomState(1)
        images = rng.randint(0, 256, (2, 8, 96, 96, 3), dtype=np.uint8)
        labels = (np.arange(16, dtype=np.int32) % 4).reshape(2, 8)
        combos = np.zeros((2, 8), dtype=np.int32)
        step_keys = jax.random.split(jax.random.PRNGKey(7), 2)

        mesh = make_fold_mesh(2, 4, batch_size=8)
        assert dict(zip(mesh.axis_names, mesh.devices.shape)) == {
            "fold": 2, "data": 2,
        }
        fold_step = make_foldwise_train_step(
            forward_train, optimizer, augment, mesh
        )
        sv, so, losses = fold_step(
            stack_fold_states(states),
            stack_fold_states(opts),
            images,
            labels,
            combos,
            jnp.stack(step_keys),
            np.array([True, False]),
        )
        got_v = unstack_fold_state(sv, 2)
        got_o = unstack_fold_state(so, 2)

        # fold 0 (active): equals the ordinary single-fold train step
        ref_step = make_train_step(forward_train, optimizer, augment)
        ref_v, ref_o, ref_loss = ref_step(
            states[0], opts[0], images[0], labels[0], combos[0], step_keys[0]
        )
        # tolerance: the fold's batch is itself sharded over 'data', which
        # reorders the f32 batch reductions vs the single-device reference
        # (measured worst leaf drift ~4e-6 abs on the virtual mesh)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            got_v[0],
            ref_v,
        )
        np.testing.assert_allclose(
            float(losses[0]), float(ref_loss), rtol=1e-5
        )

        # fold 1 (inactive): bit-identical passthrough of params AND momentum
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            got_v[1],
            states[1],
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            got_o[1],
            opts[1],
        )


class TestFoldParallelDriver:
    def test_run_kfold_parallel_matches_sequential(self, tiny_imagefolder, tmp_path):
        """The full CV protocol driven fold-parallel produces the same
        per-fold validation results and artifacts as the sequential driver."""
        from heuristique_style_transfer_code_tpu.config.schema import (
            TruncatedResNetConfig,
        )
        from heuristique_style_transfer_code_tpu.train.factories import (
            setup_truncated_resnet50,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        cfg = TruncatedResNetConfig(
            batch_size=8, lr=0.01, truncate_layer=4, dim=16, seed=0
        )
        combos = [(None, None)]
        setup = setup_truncated_resnet50(cfg, 4, combos)

        def init_fn(key, fold):
            variables, opt_state = setup.init(key)
            return variables, opt_state, setup.train_step, setup.eval_step

        common = dict(
            k_folds=2,
            seed=0,
            epochs=2,
            batch_size=8,
            hyperparameters=cfg.to_dict(),
            init_fn=init_fn,
            combos_per_sample=1,
            key=jax.random.PRNGKey(0),
            verbose_batches=False,
            num_workers=2,
        )
        seq = run_kfold(idx, save_dir=str(tmp_path / "seq"), **common)

        mesh = make_fold_mesh(2, 8, batch_size=8)
        par = run_kfold(
            idx,
            save_dir=str(tmp_path / "par"),
            foldwise_step=setup.foldwise_step(mesh),
            fold_mesh=mesh,
            **common,
        )

        assert len(par["fold_results"]) == len(seq["fold_results"]) == 2
        for s, p in zip(seq["fold_results"], par["fold_results"]):
            assert p["fold"] == s["fold"]
            for k in ("val_loss", "val_accuracy", "val_precision",
                      "val_recall", "val_f1"):
                np.testing.assert_allclose(p[k], s[k], rtol=1e-4, atol=1e-5)
        for name in (
            "training_info.json",
            "best_model_results.json",
            "fold_0_performance.json",
            "fold_1_performance.json",
        ):
            assert (tmp_path / "par" / name).exists()

    def test_parallel_rejects_resume_and_multi_dispatch(self, tiny_imagefolder, tmp_path):
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        mesh = make_fold_mesh(2, 8, batch_size=8)
        kwargs = dict(
            k_folds=2, seed=0, epochs=1, batch_size=8,
            save_dir=str(tmp_path), hyperparameters={},
            init_fn=lambda *a: None, foldwise_step=lambda *a: None,
            fold_mesh=mesh,
        )
        with pytest.raises(ValueError, match="resume"):
            run_kfold(idx, resume=True, **kwargs)
        with pytest.raises(ValueError, match="steps_per_dispatch"):
            run_kfold(idx, steps_per_dispatch=4, **kwargs)


class TestPartialFoldShardingWarning:
    def test_warns_only_when_folds_share_a_device(self, capsys):
        """Folds that share a device run the vmapped (grouped-conv) body —
        measured 0.76x sequential on a v5e chip (PERF.md) — so the CLI must
        warn whenever gcd(k_folds, devices) < k_folds, and stay quiet when
        the fold axis fully shards."""
        from heuristique_style_transfer_code_tpu.cli._common import (
            warn_partial_fold_sharding,
        )

        full = make_fold_mesh(4, 8, batch_size=8)  # fold axis = 4 = k_folds
        assert not warn_partial_fold_sharding(full, 4)
        assert "WARNING" not in capsys.readouterr().out

        partial = make_fold_mesh(3, 8, batch_size=8)  # gcd(3, 8) = 1
        assert warn_partial_fold_sharding(partial, 3)
        out = capsys.readouterr().out
        assert "only 1 of 3 folds" in out and "0.76x" in out
