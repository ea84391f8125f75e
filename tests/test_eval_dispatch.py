"""Eval-side steps_per_dispatch: K loader batches per device dispatch via an
on-device lax.scan of the unchanged per-batch program (core/mesh.py
scanned_eval_iter / jit_scanned_eval_step). Contract: results bit-identical
to per-batch dispatch — only the dispatch/fetch granularity changes.
Eval counterpart of the train loop's --steps_per_dispatch (SURVEY.md §2.4).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heuristique_style_transfer_code_tpu.core.mesh import (
    create_mesh,
    jit_eval_step,
    jit_scanned_eval_step,
    scanned_eval_iter,
)
from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
from heuristique_style_transfer_code_tpu.data.loader import HostLoader


def _toy_step(v, images_u8, labels):
    x = images_u8.astype(jnp.float32) / 255.0
    feat = x.mean(axis=(1, 2))  # (B, 3)
    logits = feat @ v["w"] + labels[:, None].astype(jnp.float32) * 0.0
    return jnp.concatenate([logits, feat], axis=1)


class TestScannedEvalStep:
    def test_bit_identical_to_per_batch(self):
        v = {"w": jnp.asarray(np.random.RandomState(0).randn(3, 5), jnp.float32)}
        rng = np.random.RandomState(1)
        batches = [
            (
                rng.randint(0, 255, (4, 8, 8, 3)).astype(np.uint8),
                rng.randint(0, 5, (4,)).astype(np.int32),
            )
            for _ in range(3)
        ]
        one = jit_eval_step(_toy_step, None, n_batch_inputs=2)
        many = jit_scanned_eval_step(_toy_step, None, n_batch_inputs=2)
        stacked = [jnp.asarray(np.stack(z)) for z in zip(*batches)]
        out_k = np.asarray(many(v, *stacked))
        for t, (im, lb) in enumerate(batches):
            ref = np.asarray(one(v, jnp.asarray(im), jnp.asarray(lb)))
            np.testing.assert_array_equal(out_k[t], ref)

    def test_mesh_sharded_matches_unsharded(self):
        v = {"w": jnp.asarray(np.random.RandomState(0).randn(3, 5), jnp.float32)}
        rng = np.random.RandomState(2)
        imgs = rng.randint(0, 255, (2, 8, 8, 8, 3)).astype(np.uint8)  # (K,B,...)
        labs = rng.randint(0, 5, (2, 8)).astype(np.int32)
        plain = jit_scanned_eval_step(_toy_step, None, n_batch_inputs=2)
        mesh = create_mesh(4)
        sharded = jit_scanned_eval_step(_toy_step, mesh, n_batch_inputs=2)
        # cross-PARTITIONING comparisons carry ~1 ULP fusion drift (CLAUDE.md
        # numerics note); K-vs-1 at the SAME partitioning is bit-exact above
        np.testing.assert_allclose(
            np.asarray(sharded(v, jnp.asarray(imgs), jnp.asarray(labs))),
            np.asarray(plain(v, jnp.asarray(imgs), jnp.asarray(labs))),
            rtol=1e-5,
        )

    def test_mesh_with_scalar_and_mixed_rank_outputs(self):
        """Steps returning per-batch scalars (rank 0/1 after stacking) must
        work under a mesh: low-rank outputs are replicated, array outputs
        sharded (regression: a fixed rank-2 out-sharding rejected them)."""

        def step(v, images_u8, labels):
            logits = _toy_step(v, images_u8, labels)
            return {"logits": logits, "mean_loss": logits.mean(),
                    "count": labels.shape[0] * jnp.ones((), jnp.int32)}

        v = {"w": jnp.asarray(np.random.RandomState(0).randn(3, 5), jnp.float32)}
        rng = np.random.RandomState(3)
        imgs = rng.randint(0, 255, (2, 8, 8, 8, 3)).astype(np.uint8)
        labs = rng.randint(0, 5, (2, 8)).astype(np.int32)
        mesh = create_mesh(4)
        # single-batch helper with a scalar in the output tree
        one = jit_eval_step(step, mesh, n_batch_inputs=2)
        o = one(v, jnp.asarray(imgs[0]), jnp.asarray(labs[0]))
        assert np.asarray(o["logits"]).shape == (8, 8)  # _toy_step: logits++feat
        assert np.asarray(o["mean_loss"]).shape == ()
        # scanned helper: stacked scalars become rank-1 (K,)
        many = jit_scanned_eval_step(step, mesh, n_batch_inputs=2)
        ref = jit_scanned_eval_step(step, None, n_batch_inputs=2)
        got = many(v, jnp.asarray(imgs), jnp.asarray(labs))
        want = ref(v, jnp.asarray(imgs), jnp.asarray(labs))
        np.testing.assert_allclose(
            np.asarray(got["logits"]), np.asarray(want["logits"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got["mean_loss"]), np.asarray(want["mean_loss"]), rtol=1e-5
        )
        np.testing.assert_array_equal(
            np.asarray(got["count"]), np.asarray(want["count"])
        )


class TestScannedEvalIter:
    def _loader(self, n_batches, batch=4, seed=0):
        rng = np.random.RandomState(seed)
        return [
            {
                "image": rng.randint(0, 255, (batch, 8, 8, 3)).astype(np.uint8),
                "label": rng.randint(0, 5, (batch,)).astype(np.int32),
                "n_valid": batch,
            }
            for _ in range(n_batches)
        ]

    @pytest.mark.parametrize("k", [2, 3, 7])
    def test_remainders_and_order(self, k):
        """5 batches at K in {2,3,7}: scanned dispatch + remainder one-at-a-
        time must reproduce per-batch results exactly, in loader order."""
        v = {"w": jnp.asarray(np.random.RandomState(0).randn(3, 5), jnp.float32)}
        loader = self._loader(5)
        ref = [
            np.asarray(
                jit_eval_step(_toy_step, None, n_batch_inputs=2)(
                    v, jnp.asarray(b["image"]), jnp.asarray(b["label"])
                )
            )
            for b in loader
        ]
        outs = list(
            scanned_eval_iter(
                _toy_step, v, loader, None,
                input_keys=("image", "label"), steps_per_dispatch=k,
            )
        )
        assert len(outs) == len(loader)
        for (b, out), orig, r in zip(outs, loader, ref):
            assert b is orig  # loader order preserved, same dict objects
            np.testing.assert_array_equal(out, r)

    def test_tuple_outputs(self):
        def step(v, images_u8):
            x = images_u8.astype(jnp.float32)
            return x.mean(axis=(1, 2, 3)), jnp.argmax(x.sum(axis=(1, 2)), axis=-1)

        loader = self._loader(4)
        singles = [
            jax.tree_util.tree_map(
                np.asarray, jit_eval_step(step, None)(None, jnp.asarray(b["image"]))
            )
            for b in loader
        ]
        for (b, (m, a)), (mr, ar) in zip(
            scanned_eval_iter(
                step, None, loader, None,
                input_keys=("image",), steps_per_dispatch=2,
            ),
            singles,
        ):
            np.testing.assert_array_equal(m, mr)
            np.testing.assert_array_equal(a, ar)


class TestHarnessStepsPerDispatch:
    def test_metrics_and_features_identical(self, tiny_imagefolder, tmp_path, family1):
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            truncated_moco_apply,
        )
        from heuristique_style_transfer_code_tpu.tasks.classification import (
            run_classification_test,
        )

        cfg, variables, forward_eval = family1

        def embed(v, images):
            emb, _ = truncated_moco_apply(v["moco"], images, cfg.truncate_layer)
            return emb

        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        res = {}
        for k in (1, 2):
            loader = HostLoader(idx.samples, batch_size=4, shuffle=False)
            res[k] = run_classification_test(
                forward_eval, variables, loader, idx.samples, idx.classes,
                str(tmp_path / f"k{k}"), prob_threshold=0.0, compute_auc=True,
                embed_fn=embed, steps_per_dispatch=k,
            )
        assert res[1]["accuracy"] == res[2]["accuracy"]
        assert res[1]["loss"] == res[2]["loss"]
        np.testing.assert_array_equal(res[1]["preds"], res[2]["preds"])
        np.testing.assert_array_equal(
            res[1]["confusion_matrix"], res[2]["confusion_matrix"]
        )
        np.testing.assert_allclose(
            res[1]["features"], res[2]["features"], rtol=0, atol=0
        )
        assert res[1]["auc"] == res[2]["auc"]

    def test_measure_time_rejected(self, tiny_imagefolder, tmp_path, family1):
        from heuristique_style_transfer_code_tpu.tasks.classification import (
            run_classification_test,
        )

        cfg, variables, forward_eval = family1
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples, batch_size=4, shuffle=False)
        with pytest.raises(ValueError, match="times_test"):
            run_classification_test(
                forward_eval, variables, loader, idx.samples, idx.classes,
                str(tmp_path / "mt"), measure_time=True, steps_per_dispatch=2,
            )

    def test_embeddings_identical(self, tiny_imagefolder, family1):
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            truncated_moco_apply,
        )
        from heuristique_style_transfer_code_tpu.tasks.embeddings import (
            compute_embeddings_with_paths,
        )

        cfg, variables, _ = family1

        def embed(v, images):
            emb, _ = truncated_moco_apply(v["moco"], images, cfg.truncate_layer)
            return emb

        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        out = {}
        for k in (1, 4):
            loader = HostLoader(idx.samples, batch_size=2, shuffle=False)
            out[k] = compute_embeddings_with_paths(
                embed, variables, loader, idx.samples, steps_per_dispatch=k
            )
        np.testing.assert_array_equal(out[1][0], out[4][0])
        np.testing.assert_array_equal(out[1][1], out[4][1])
        assert out[1][2] == out[4][2]
