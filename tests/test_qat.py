"""QAT (quantization-aware training, nn/resnet_qat.py).

The load-bearing property: the fake-quant training forward is an exact
differentiable simulation of the int8 deploy graph — same dataflow, same
scale derivations — so what QAT optimises is what export ships.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
    classifier_init,
    combined_apply_int8,
    combined_apply_qat,
    truncated_moco_init,
)
from heuristique_style_transfer_code_tpu.nn.resnet_int8 import (
    calibrate_activation_scales,
    quantize_resnet50,
    resnet50_apply_int8,
)
from heuristique_style_transfer_code_tpu.nn.resnet_qat import (
    fake_quant,
    qat_resnet50_apply,
)
from heuristique_style_transfer_code_tpu.train.qat import qat_finetune
from heuristique_style_transfer_code_tpu.train.train_loop import (
    masked_cross_entropy,
)

TRUNCATE = 6


@pytest.fixture(scope="module")
def setup():
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    variables = {
        "moco": truncated_moco_init(k1, TRUNCATE, dim=16),
        "classifier": classifier_init(k2, 16, 4),
    }
    x = jax.random.normal(k3, (4, 64, 64, 3)) * 0.8
    # non-trivial running stats so BN folding is exercised for real: one
    # train-mode forward updates mean/var from the data (fresh-init stats
    # are the 0/1 identity, which would make folding vacuous)
    from heuristique_style_transfer_code_tpu.nn.resnet import resnet50_apply

    _, _, new_enc = resnet50_apply(
        variables["moco"]["encoder"], x, truncate=TRUNCATE, train=True
    )
    variables["moco"]["encoder"] = new_enc
    scales = calibrate_activation_scales(
        variables["moco"]["encoder"], [x], TRUNCATE
    )
    return variables, scales, x


class TestFakeQuantSimulatesInt8:
    def test_encoder_features_match(self, setup):
        variables, scales, x = setup
        enc = variables["moco"]["encoder"]
        q = quantize_resnet50(enc, scales, TRUNCATE)
        feats_i8 = np.asarray(resnet50_apply_int8(q, x))
        feats_fq = np.asarray(qat_resnet50_apply(enc, scales, x, TRUNCATE))
        # identical math, but f32 conv accumulation vs exact int32 flips
        # round-to-nearest at quantum boundaries — agreement is measured in
        # quanta of the output scale (a few, on ~15% of elements), the same
        # contract as any fake-quant framework
        s_out = q["layer2"][-1]["s_out"]
        quanta = np.abs(feats_fq - feats_i8) / s_out
        assert quanta.max() <= 8, quanta.max()
        assert np.mean(quanta > 1.5) < 0.10, np.mean(quanta > 1.5)
        cos = np.sum(feats_fq * feats_i8) / (
            np.linalg.norm(feats_fq) * np.linalg.norm(feats_i8)
        )
        assert cos > 0.999, cos
        # and not trivially equal to the unquantised forward
        from heuristique_style_transfer_code_tpu.nn.resnet import resnet50_apply

        feats_f32, _, _ = resnet50_apply(enc, x, truncate=TRUNCATE)
        assert float(jnp.max(jnp.abs(feats_f32 - feats_fq))) > 1e-3

    def test_combined_logits_match(self, setup):
        variables, scales, x = setup
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            prepare_combined_int8,
        )

        q = quantize_resnet50(variables["moco"]["encoder"], scales, TRUNCATE)
        logits_i8, _ = combined_apply_int8(
            q, variables["moco"], variables["classifier"], x
        )
        logits_fq = combined_apply_qat(
            variables["moco"], variables["classifier"], scales, x, TRUNCATE
        )
        a, b = np.asarray(logits_fq), np.asarray(logits_i8)
        assert np.array_equal(a.argmax(-1), b.argmax(-1))
        cos = np.sum(a * b) / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999, cos

    def test_gram_attention_twin_matches(self, setup):
        _, _, x = setup
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_apply_int8,
            gram_attention_apply_qat,
            gram_attention_init,
        )

        v = gram_attention_init(jax.random.PRNGKey(5), TRUNCATE, 4, 4)
        scales = calibrate_activation_scales(v["encoder"], [x], TRUNCATE)
        q = quantize_resnet50(v["encoder"], scales, TRUNCATE)
        emb_i8, logits_i8, _ = gram_attention_apply_int8(q, v, x, 4, 4)
        emb_fq, logits_fq = gram_attention_apply_qat(v, scales, x, TRUNCATE, 4, 4)
        for a, b in ((emb_fq, emb_i8), (logits_fq, logits_i8)):
            a, b = np.asarray(a), np.asarray(b)
            rel = np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)
            assert rel < 1e-2, rel


class TestSTE:
    def test_fake_quant_gradient_clipped_identity(self):
        s = 0.1
        # -20/0.1 = -200 and 13/0.1 = 130 fall outside [-127, 127]: clipped,
        # zero gradient; everything in range passes identity
        x = jnp.array([-20.0, -0.05, 0.0, 0.033, 5.0, 13.0])
        g = jax.grad(lambda x: jnp.sum(fake_quant(x, s)))(x)
        np.testing.assert_array_equal(np.asarray(g), [0, 1, 1, 1, 1, 0])

    def test_bn_stats_get_zero_grad(self, setup):
        variables, scales, x = setup
        labels = jnp.array([0, 1, 2, 3])

        def loss_fn(v):
            logits = combined_apply_qat(v["moco"], v["classifier"], scales,
                                        x, TRUNCATE)
            return masked_cross_entropy(logits, labels)

        grads = jax.grad(loss_fn)(variables)

        def check(path, leaf):
            name = str(path[-1].key) if hasattr(path[-1], "key") else ""
            if name in ("mean", "var"):
                assert float(jnp.max(jnp.abs(leaf))) == 0.0, path

        jax.tree_util.tree_map_with_path(check, grads)
        # conv kernels DO get gradient through the fake-quant STE
        k = grads["moco"]["encoder"]["conv1"]["kernel"]
        assert float(jnp.max(jnp.abs(k))) > 0.0


class TestBuilderFamily2:
    def test_build_int8_family2_qat_branch(self, setup, tmp_path):
        """The shared serve/eval builder runs its QAT branch end to end:
        fine-tunes, exports, persists, and the returned apply works."""
        _, _, x = setup
        from heuristique_style_transfer_code_tpu.cli._common import (
            build_int8_family2,
        )
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )

        v = gram_attention_init(jax.random.PRNGKey(7), TRUNCATE, 4, 4)
        labels = jnp.array([0, 1, 2, 3])
        qpath = str(tmp_path / "q2.npz")
        apply_eval, heads = build_int8_family2(
            v, TRUNCATE, 4, 4, cal_batches=[x], quantized_path=qpath,
            qat_steps=3, qat_lr=1e-4, labeled_batches=[(x, labels)],
        )
        emb, logits = apply_eval(heads, x)
        assert logits.shape == (4, 4) and bool(jnp.all(jnp.isfinite(logits)))
        assert "encoder" not in heads  # f32 encoder stripped from the tree
        import os

        assert os.path.exists(qpath)

    def test_build_int8_family2_qat_requires_labels(self, setup):
        _, _, x = setup
        from heuristique_style_transfer_code_tpu.cli._common import (
            build_int8_family2,
        )
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_init,
        )

        v = gram_attention_init(jax.random.PRNGKey(7), TRUNCATE, 4, 4)
        with pytest.raises(ValueError, match="labeled"):
            build_int8_family2(v, TRUNCATE, 4, 4, cal_batches=[x], qat_steps=3)


class TestFinetune:
    def test_loss_decreases_and_export_improves(self, setup):
        variables, scales, x = setup
        labels = jnp.array([0, 1, 2, 3])

        def forward_logits(v, images):
            return combined_apply_qat(v["moco"], v["classifier"], scales,
                                      images, TRUNCATE)

        def int8_loss(v):
            q = quantize_resnet50(v["moco"]["encoder"], scales, TRUNCATE)
            logits, _ = combined_apply_int8(q, v["moco"], v["classifier"], x)
            return float(masked_cross_entropy(logits, labels))

        loss0_fq = float(masked_cross_entropy(forward_logits(variables, x), labels))
        loss0_i8 = int8_loss(variables)
        tuned = qat_finetune(variables, forward_logits, [(x, labels)],
                             steps=20, lr=1e-3)
        loss1_fq = float(masked_cross_entropy(forward_logits(tuned, x), labels))
        loss1_i8 = int8_loss(tuned)
        assert loss1_fq < loss0_fq, (loss0_fq, loss1_fq)
        # the point of training through the deploy graph: the EXPORTED int8
        # model improves too
        assert loss1_i8 < loss0_i8, (loss0_i8, loss1_i8)
        # BN running stats were frozen
        enc0 = variables["moco"]["encoder"]
        enc1 = tuned["moco"]["encoder"]
        np.testing.assert_array_equal(enc0["bn1"]["mean"], enc1["bn1"]["mean"])
        np.testing.assert_array_equal(enc0["bn1"]["var"], enc1["bn1"]["var"])
