"""Edge cases pinned from the reference's behaviour + precision policy."""
import os
import numpy as np
import pytest
import jax
import jax.numpy as jnp


class TestGramAttentionEdges:
    def test_truncate_4_returns_zeros(self):
        """No stage executed -> no grams -> zeros (reference
        Models_RESNET50_TRUNCATE_GRAM_with_Attention.py:48-49)."""
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_apply,
            gram_attention_init,
        )

        v = gram_attention_init(jax.random.PRNGKey(0), 4, 4, 4)
        x = jnp.ones((2, 64, 64, 3))
        emb, logits, _ = gram_attention_apply(v, x, truncate=4, gram_matrix_size=4,
                                              num_classes=4)
        assert np.all(np.asarray(logits) == 0)
        assert np.all(np.asarray(emb) == 0)

    def test_seq_len_matches_executed_stages(self):
        from heuristique_style_transfer_code_tpu.nn.resnet import resnet50_apply, resnet50_init

        params = resnet50_init(jax.random.PRNGKey(0))
        x = jnp.ones((1, 64, 64, 3))
        for truncate, want in [(5, 1), (6, 2), (7, 3), (8, 4)]:
            _, grams, _ = resnet50_apply(params, x, truncate=truncate,
                                         collect_grams=True, gram_pool_size=4)
            assert len(grams) == want


class TestBf16Policy:
    def test_bf16_argmax_matches_f32(self):
        """The bf16 activation policy must not change predictions on
        well-separated inputs."""
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        v = {
            "moco": truncated_moco_init(k1, 5, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }
        rng = np.random.RandomState(0)
        x = rng.randn(4, 96, 96, 3).astype(np.float32)
        logits_f32, _ = combined_apply(v["moco"], v["classifier"], jnp.asarray(x), 5)
        logits_bf16, _ = combined_apply(
            v["moco"], v["classifier"], jnp.asarray(x).astype(jnp.bfloat16), 5
        )
        f32 = np.asarray(logits_f32)
        bf16 = np.asarray(logits_bf16).astype(np.float32)
        np.testing.assert_allclose(bf16, f32, rtol=0.1, atol=0.1)
        # argmax must agree wherever the f32 decision margin exceeds the
        # bf16 noise floor (random-init logits can have ~0 margins)
        sorted_ = np.sort(f32, axis=1)
        margin = sorted_[:, -1] - sorted_[:, -2]
        confident = margin > 0.05
        np.testing.assert_array_equal(
            bf16.argmax(1)[confident], f32.argmax(1)[confident]
        )


class TestLoaderEdges:
    def test_single_sample_dataset(self, tiny_imagefolder):
        from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
        from heuristique_style_transfer_code_tpu.data.loader import HostLoader

        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        loader = HostLoader(idx.samples[:1], batch_size=8)
        batches = list(loader)
        assert len(batches) == 1
        assert batches[0]["n_valid"] == 1
        assert (batches[0]["label"][1:] == -1).all()

    def test_drop_last(self, tiny_imagefolder):
        from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
        from heuristique_style_transfer_code_tpu.data.loader import HostLoader

        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))  # 12 samples
        loader = HostLoader(idx.samples, batch_size=8, drop_last=True)
        assert len(list(loader)) == 1

    def test_shuffle_deterministic_per_seed(self, tiny_imagefolder):
        from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
        from heuristique_style_transfer_code_tpu.data.loader import HostLoader

        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        a = HostLoader(idx.samples, 4, shuffle=True, seed=7)
        b = HostLoader(idx.samples, 4, shuffle=True, seed=7)
        la = [tuple(batch["indices"]) for batch in a]
        lb = [tuple(batch["indices"]) for batch in b]
        assert la == lb


class TestShapeFilteredUpdate:
    def test_partial_and_mismatch(self):
        from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
            shape_filtered_update,
        )

        target = {
            "a": np.zeros((2, 3)),
            "b": [np.zeros(4), np.zeros(5)],
            "c": {"x": np.zeros(2), "norm": None},
        }
        source = {
            "a": np.ones((2, 3)),       # same shape -> taken
            "b": [np.ones(9)],          # wrong shape + short list -> kept
            "c": {"x": np.ones(2)},     # nested partial
        }
        out = shape_filtered_update(target, source)
        assert (out["a"] == 1).all()
        assert (out["b"][0] == 0).all() and (out["b"][1] == 0).all()
        assert (out["c"]["x"] == 1).all()
        assert out["c"]["norm"] is None


class TestConfigRoundTrip:
    def test_null_extra_keys_preserved(self, tmp_path):
        """Unknown keys round-trip verbatim INCLUDING null values (unset
        declared optionals are still omitted)."""
        import json as _json

        from heuristique_style_transfer_code_tpu.config.schema import (
            TruncatedResNetConfig,
        )

        p = str(tmp_path / "hp.json")
        with open(p, "w") as f:
            _json.dump({"batch_size": 8, "tensorboard_logdir": None,
                        "custom_tag": "x"}, f)
        cfg = TruncatedResNetConfig.from_json(p)
        out = cfg.to_dict()
        assert out["tensorboard_logdir"] is None  # null extra key kept
        assert out["custom_tag"] == "x"
        assert "seed" not in out  # unset declared optional still omitted


class TestBf16Training:
    @pytest.mark.parametrize("family", ["f1", "f2", "f3"])
    def test_bf16_train_step_runs(self, family):
        """bf16 activations through fwd+bwd+SGD for every family (regression:
        f32 preferred_element_type used to break the conv transpose rule)."""
        from heuristique_style_transfer_code_tpu.config.schema import (
            GramAttentionConfig,
            MultiPatchGANConfig,
            TruncatedResNetConfig,
        )
        from heuristique_style_transfer_code_tpu.train.factories import (
            setup_gram_attention,
            setup_multi_patchgan,
            setup_truncated_resnet50,
        )

        if family == "f1":
            setup = setup_truncated_resnet50(
                TruncatedResNetConfig(batch_size=4, truncate_layer=5, dim=16),
                4, [(None, None)], compute_dtype=jnp.bfloat16,
            )
        elif family == "f2":
            setup = setup_gram_attention(
                GramAttentionConfig(batch_size=4, truncate_layer=5,
                                    gram_matrix_size=4, num_classes=4),
                4, [(None, None)], compute_dtype=jnp.bfloat16,
            )
        else:
            setup = setup_multi_patchgan(
                MultiPatchGANConfig(batch_size=4,
                                    patch_sizes={"small": 10, "medium": 16, "large": 20},
                                    ndf=16, gram_matrix_dim=16, norm="instance",
                                    num_classes=4),
                4, [(None, None)], compute_dtype=jnp.bfloat16,
            )
        v, o = setup.init(jax.random.PRNGKey(0))
        rng = np.random.RandomState(0)
        imgs = rng.randint(0, 256, (4, 256, 256, 3), np.uint8)
        labels = (np.arange(4) % 4).astype(np.int32)
        v, o, loss = setup.train_step(v, o, imgs, labels, np.zeros(4, np.int32),
                                      jax.random.PRNGKey(1))
        assert np.isfinite(float(loss))


class TestObservability:
    def test_profile_trace_written(self, tmp_path):
        from heuristique_style_transfer_code_tpu.utils.logging import maybe_profile

        d = str(tmp_path / "trace")
        with maybe_profile(d):
            jnp.ones((8, 8)).sum().block_until_ready()
        assert os.path.isdir(d) and any(os.scandir(d))

    def test_kfold_events_jsonl(self, tiny_imagefolder, tmp_path):
        import json as _json

        from heuristique_style_transfer_code_tpu.config.schema import TruncatedResNetConfig
        from heuristique_style_transfer_code_tpu.train.factories import (
            make_truncated_resnet50,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold
        from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        cfg = TruncatedResNetConfig(batch_size=8, lr=0.01, truncate_layer=4, dim=16, seed=0)
        save_dir = str(tmp_path / "out")

        def init_fn(key, fold):
            v, o, ts, es, _ = make_truncated_resnet50(key, cfg, 4, [(None, None)])
            return v, o, ts, es

        run_kfold(
            idx, k_folds=2, seed=0, epochs=1, batch_size=8, save_dir=save_dir,
            hyperparameters=cfg.to_dict(), init_fn=init_fn, verbose_batches=False,
        )
        path = os.path.join(save_dir, "events.jsonl")
        assert os.path.exists(path)
        events = [_json.loads(l) for l in open(path)]
        kinds = [e["kind"] for e in events]
        assert kinds.count("fold_result") == 2 and "average_results" in kinds


class TestCompileCache:
    def test_disabled_by_env(self, monkeypatch):
        from heuristique_style_transfer_code_tpu.core.cache import enable_compile_cache

        monkeypatch.setenv("HST_COMPILE_CACHE", "0")
        assert enable_compile_cache() is None

    def test_enables_into_directory(self, monkeypatch, tmp_path):
        import jax

        from heuristique_style_transfer_code_tpu.core.cache import enable_compile_cache

        target = str(tmp_path / "xla_cache")
        monkeypatch.setenv("HST_COMPILE_CACHE", target)
        before = jax.config.jax_compilation_cache_dir
        try:
            assert enable_compile_cache() == target
            assert os.path.isdir(target)
            assert jax.config.jax_compilation_cache_dir == target
        finally:
            # restore the process-global config (monkeypatch only covers env)
            jax.config.update("jax_compilation_cache_dir", before)


class TestWeightedAucBranch:
    """The two eval references pick the binary/multiclass AUC branch
    differently: gram_attention on the observed labels, Multi_PatchGAN on
    the probability-matrix width (advisor finding, round 3)."""

    def _subset_probs_labels(self):
        # 4-class model evaluated on a subset whose labels cover 2 classes
        rng = np.random.RandomState(0)
        probs = rng.dirichlet(np.ones(4), size=10)
        labels = np.array([0, 3] * 5)
        return labels, probs

    def test_probs_branch_matches_multi_patchgan_reference(self, capsys):
        from heuristique_style_transfer_code_tpu.cli._common import (
            weighted_auc_or_none,
        )

        labels, probs = self._subset_probs_labels()
        # probs.shape[1] > 2 -> multiclass path -> ValueError on the absent
        # classes -> reference warning + None (auc: null in the json)
        auc = weighted_auc_or_none(labels, probs, branch_on="probs")
        assert auc is None
        assert "Impossible de calculer l'AUC" in capsys.readouterr().out

    def test_labels_branch_matches_gram_attention_reference(self):
        from sklearn.metrics import roc_auc_score

        from heuristique_style_transfer_code_tpu.cli._common import (
            weighted_auc_or_none,
        )

        labels, probs = self._subset_probs_labels()
        # <=2 unique labels -> the gram_attention reference's binary branch
        auc = weighted_auc_or_none(labels, probs)
        assert auc == pytest.approx(float(roc_auc_score(labels, probs[:, 1])))
