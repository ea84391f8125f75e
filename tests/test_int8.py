"""int8 PTQ inference path: folding exactness, quantised accuracy vs f32."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
    classifier_init,
    combined_apply,
    combined_apply_int8,
    prepare_combined_int8,
    truncated_moco_init,
)
from heuristique_style_transfer_code_tpu.nn.resnet import resnet50_apply
from heuristique_style_transfer_code_tpu.nn.resnet_int8 import (
    calibrate_activation_scales,
    fold_conv_bn,
    quantize_resnet50,
    resnet50_apply_int8,
)

TRUNCATE = 5  # stem + layer1: cheap on CPU but covers stem/blocks/downsample


def _vars(seed=0, truncate=TRUNCATE):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    return {
        "moco": truncated_moco_init(k1, truncate, dim=16),
        "classifier": classifier_init(k2, 16, 4),
    }


def _calib_batches(seed=1, n=2, b=4, hw=64):
    rng = np.random.RandomState(seed)
    # ImageNet-normalised-ish inputs (zero-mean, ~unit scale)
    return [rng.randn(b, hw, hw, 3).astype(np.float32) for _ in range(n)]


class TestFolding:
    def test_fold_conv_bn_exact(self):
        from heuristique_style_transfer_code_tpu.ops.conv import conv2d
        from heuristique_style_transfer_code_tpu.ops.norm import batch_norm

        rng = np.random.RandomState(0)
        conv = {"kernel": jnp.asarray(rng.randn(3, 3, 8, 16).astype(np.float32) * 0.1)}
        bn = {
            "scale": jnp.asarray(rng.rand(16).astype(np.float32) + 0.5),
            "bias": jnp.asarray(rng.randn(16).astype(np.float32)),
            "mean": jnp.asarray(rng.randn(16).astype(np.float32)),
            "var": jnp.asarray(rng.rand(16).astype(np.float32) + 0.2),
        }
        x = jnp.asarray(rng.randn(2, 10, 10, 8).astype(np.float32))
        want = batch_norm(bn, conv2d(conv, x, padding=1), train=False)
        k, b = fold_conv_bn(conv, bn)
        got = conv2d({"kernel": jnp.asarray(k), "bias": jnp.asarray(b)}, x, padding=1)
        np.testing.assert_allclose(np.asarray(want), np.asarray(got), rtol=2e-4, atol=2e-5)


class TestInt8Forward:
    @pytest.fixture(scope="class")
    def quantized(self):
        variables = _vars()
        enc = variables["moco"]["encoder"]
        batches = _calib_batches()
        scales = calibrate_activation_scales(enc, batches, TRUNCATE)
        q = quantize_resnet50(enc, scales, TRUNCATE)
        return variables, enc, q, batches

    def test_features_close_to_f32(self, quantized):
        variables, enc, q, batches = quantized
        x = jnp.asarray(batches[0])
        f32_feats, _, _ = resnet50_apply(enc, x, truncate=TRUNCATE, train=False)
        i8_feats = resnet50_apply_int8(q, x)
        assert i8_feats.shape == f32_feats.shape
        a = np.asarray(f32_feats).reshape(x.shape[0], -1)
        b = np.asarray(i8_feats).reshape(x.shape[0], -1)
        cos = (a * b).sum(1) / (np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1))
        assert cos.min() > 0.99, cos

    def test_intermediates_are_int8(self, quantized):
        """Every inter-conv tensor in the compiled program must be int8 —
        that's the entire point (HBM traffic)."""
        _, _, q, batches = quantized
        x = jnp.asarray(batches[0])
        text = jax.jit(lambda x: resnet50_apply_int8(q, x)).lower(x).as_text()
        assert ("s8[" in text) or ("i8>" in text) or ("xi8" in text), text[:2000]
        assert ("convolution" in text) or ("conv" in text)

    def test_out_of_range_inputs_still_sane(self, quantized):
        # inputs 3x the calibration range: clipping must not produce NaN/inf
        _, _, q, _ = quantized
        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32) * 3)
        out = np.asarray(resnet50_apply_int8(q, x))
        assert np.isfinite(out).all()

    def test_combined_argmax_agreement(self, quantized):
        variables, enc, q, batches = quantized
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(16, 64, 64, 3).astype(np.float32))
        logits_f32, _ = combined_apply(
            variables["moco"], variables["classifier"], x, TRUNCATE
        )
        logits_i8, _ = combined_apply_int8(
            q, variables["moco"], variables["classifier"], x
        )
        a = np.asarray(logits_f32).argmax(1)
        b = np.asarray(logits_i8).argmax(1)
        # random-init logits are nearly degenerate; still expect strong
        # agreement from a 0.99-cosine feature match
        assert (a == b).mean() >= 0.75
        np.testing.assert_allclose(
            np.asarray(logits_i8), np.asarray(logits_f32), atol=0.15
        )

    def test_prepare_helper(self, quantized):
        variables, _, _, batches = quantized
        q = prepare_combined_int8(variables["moco"], TRUNCATE, batches)
        x = jnp.asarray(batches[0])
        out, aux = combined_apply_int8(q, variables["moco"], variables["classifier"], x)
        assert aux is None and out.shape == (x.shape[0], 4)

    def test_gram_attention_int8_close_to_f32(self):
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_apply,
            gram_attention_apply_int8,
            gram_attention_init,
            prepare_gram_attention_int8,
        )

        t, s, nc = 5, 4, 4
        params = gram_attention_init(jax.random.PRNGKey(2), t, nc, s)
        batches = _calib_batches(seed=5)
        q = prepare_gram_attention_int8(params, t, batches)
        x = jnp.asarray(batches[0])
        emb_f, log_f, _ = gram_attention_apply(params, x, t, s, nc)
        emb_q, log_q, aux = gram_attention_apply_int8(q, params, x, s, nc)
        assert aux is None
        assert emb_q.shape == emb_f.shape and log_q.shape == log_f.shape
        a, b = np.asarray(emb_f), np.asarray(emb_q)
        cos = (a * b).sum(1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1) + 1e-12
        )
        assert cos.min() > 0.98, cos
        np.testing.assert_allclose(
            np.asarray(log_q), np.asarray(log_f), atol=0.2
        )

    def test_save_load_quantized_roundtrip(self, quantized, tmp_path):
        from heuristique_style_transfer_code_tpu.nn.resnet_int8 import (
            load_quantized,
            save_quantized,
        )

        _, _, q, batches = quantized
        p = str(tmp_path / "q.npz")
        save_quantized(q, p)
        q2 = load_quantized(p)
        assert isinstance(q2["s_input"], float)
        assert isinstance(q2["truncate"], int)
        x = jnp.asarray(batches[0])
        np.testing.assert_array_equal(
            np.asarray(resnet50_apply_int8(q, x)),
            np.asarray(resnet50_apply_int8(q2, x)),
        )

    def test_truncate_bounds(self):
        variables = _vars()
        with pytest.raises(ValueError):
            quantize_resnet50(
                variables["moco"]["encoder"],
                {"input": 1.0, "stem": 1.0},
                truncate=9,
            )


class TestCalibrationHygiene:
    """int8 calibration source resolution must be leakage-free by default
    (VERDICT r2 #4 / ADVICE r2): prefer --calib_data, then the --data train/
    split; the evaluated test split only as a warned last resort."""

    @staticmethod
    def _args(**kw):
        import argparse

        base = {"calib_data": None, "data": None}
        base.update(kw)
        return argparse.Namespace(**base)

    def test_prefers_train_split_of_data(self, tiny_imagefolder):
        from heuristique_style_transfer_code_tpu.cli._common import (
            make_calibration_loader,
        )

        loader = make_calibration_loader(
            self._args(data=str(tiny_imagefolder)), batch_size=4
        )
        assert all("/train/" in p for p, _ in loader.samples)

    def test_calib_data_overrides_data(self, tiny_imagefolder, tmp_path):
        import shutil

        from heuristique_style_transfer_code_tpu.cli._common import (
            make_calibration_loader,
        )

        # a calib root with only a test/ split: chosen without warning
        calib_root = tmp_path / "calib"
        shutil.copytree(str(tiny_imagefolder / "test"), str(calib_root / "test"))
        loader = make_calibration_loader(
            self._args(calib_data=str(calib_root), data=str(tiny_imagefolder)),
            batch_size=4,
        )
        assert all(str(calib_root) in p for p, _ in loader.samples)

    def test_test_split_fallback_warns(self, tiny_imagefolder, tmp_path, capsys):
        import shutil

        from heuristique_style_transfer_code_tpu.cli._common import (
            make_calibration_loader,
        )

        root = tmp_path / "testonly"
        shutil.copytree(str(tiny_imagefolder / "test"), str(root / "test"))
        loader = make_calibration_loader(self._args(data=str(root)), batch_size=4)
        assert all("/test/" in p for p, _ in loader.samples)
        assert "Avertissement" in capsys.readouterr().out

    def test_calibration_batches_span_classes(self, tiny_imagefolder):
        """ImageFolder samples are sorted class-by-class; the calibration
        loader must interleave classes so the first (only) calibration
        batches are not all the alphabetically-first class."""
        from heuristique_style_transfer_code_tpu.cli._common import (
            make_calibration_loader,
        )

        loader = make_calibration_loader(
            self._args(data=str(tiny_imagefolder)), batch_size=4
        )
        first = next(iter(loader))
        labels = set(first["label"][: first["n_valid"]].tolist())
        assert labels == {0, 1, 2, 3}

    def test_no_source_raises(self):
        from heuristique_style_transfer_code_tpu.cli._common import (
            make_calibration_loader,
        )

        with pytest.raises(ValueError, match="calib"):
            make_calibration_loader(self._args(), batch_size=4)
