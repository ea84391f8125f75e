"""Full-model numerical parity: converted torch checkpoints -> identical
outputs from the JAX models. The gram-attention and PatchGAN golden models are
the *actual reference classes* imported from /root/reference (they only
depend on torch, not torchvision)."""
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tests.torch_ref import randomized_resnet50

from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
    convert_gram_attention_checkpoint,
    convert_moco_checkpoint,
    convert_multi_patchgan_test_checkpoint,
    convert_resnet_children,
    to_numpy_state_dict,
)
from heuristique_style_transfer_code_tpu.models import (
    classifier_apply,
    gram_attention_apply,
    multiscale_test_apply,
    truncated_moco_apply,
)
from heuristique_style_transfer_code_tpu.nn.resnet import resnet50_apply


def _jx(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


@pytest.fixture(scope="module")
def torch_resnet():
    return randomized_resnet50(seed=0)


@pytest.fixture(scope="module")
def image_batch():
    rng = np.random.RandomState(1)
    return rng.randn(2, 3, 224, 224).astype(np.float32)


class TestResNet50Parity:
    def test_full_forward(self, torch_resnet, image_batch):
        with torch.no_grad():
            want = torch_resnet(torch.from_numpy(image_batch)).numpy()
        params = convert_resnet_children(to_numpy_state_dict(torch_resnet.state_dict()))
        got, _, _ = resnet50_apply(params, _jx(image_batch), truncate=10)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)

    def test_truncated_stage_features(self, torch_resnet, image_batch):
        import torch.nn as nn

        trunc = nn.Sequential(*list(torch_resnet.children())[:6])  # through layer2
        with torch.no_grad():
            want = trunc(torch.from_numpy(image_batch)).numpy()
        params = convert_resnet_children(to_numpy_state_dict(torch_resnet.state_dict()))
        got, _, _ = resnet50_apply(params, _jx(image_batch), truncate=6)
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-3, atol=1e-3
        )


class TestTruncatedMoCoParity:
    @pytest.fixture(scope="class")
    def torch_models(self, torch_resnet):
        from Models.Models_RESNET50_TRUNCATE import Classifier, TruncatedMoCoV3

        torch.manual_seed(3)
        moco = TruncatedMoCoV3(torch_resnet, truncate_after_layer=8, dim=256, device="cpu")
        clf = Classifier(input_dim=256, num_classes=4)
        moco.eval()
        clf.eval()
        return moco, clf

    def test_nested_checkpoint_roundtrip(self, torch_models, image_batch):
        moco, clf = torch_models
        ckpt = {
            "moco_model_state_dict": to_numpy_state_dict(moco.state_dict()),
            "classifier_state_dict": to_numpy_state_dict(clf.state_dict()),
        }
        tree = convert_moco_checkpoint(ckpt)
        with torch.no_grad():
            want_emb = moco(torch.from_numpy(image_batch)).numpy()
            want_logits = clf(torch.from_numpy(want_emb)).numpy()
        emb, _ = truncated_moco_apply(tree["moco"], _jx(image_batch), truncate=8)
        logits = classifier_apply(tree["classifier"], emb)
        np.testing.assert_allclose(np.asarray(emb), want_emb, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(logits), want_logits, rtol=1e-3, atol=1e-3)

    def test_flat_checkpoint_split(self, torch_models, image_batch):
        """Strategy (a) flat layout: moco keys + classifier.* keys mixed."""
        moco, clf = torch_models
        flat = dict(to_numpy_state_dict(moco.state_dict()))
        for k, v in to_numpy_state_dict(clf.state_dict()).items():
            flat[f"classifier.{k[len('fc.'):]}"] = v  # "fc.weight" -> "classifier.weight"
        tree = convert_moco_checkpoint(flat)
        emb, _ = truncated_moco_apply(tree["moco"], _jx(image_batch), truncate=8)
        logits = classifier_apply(tree["classifier"], emb)
        with torch.no_grad():
            want = clf(moco(torch.from_numpy(image_batch))).numpy()
        np.testing.assert_allclose(np.asarray(logits), want, rtol=1e-3, atol=1e-3)


class TestGramAttentionParity:
    @pytest.mark.parametrize("truncate,gram_size", [(8, 7), (6, 4)])
    def test_component_checkpoint(self, torch_resnet, image_batch, truncate, gram_size):
        from Models.Models_RESNET50_TRUNCATE_GRAM_with_Attention import (
            TruncatedResNet50_for_test,
        )

        torch.manual_seed(4)
        model = TruncatedResNet50_for_test(
            torch_resnet, truncate_after_layer=truncate, num_classes=4,
            gram_matrix_size=gram_size, device="cpu",
        )
        model.eval()
        ckpt = {
            "truncated_encoder": to_numpy_state_dict(model.truncated_encoder.state_dict()),
            "classifier": to_numpy_state_dict(model.classifier.state_dict()),
            "attention": to_numpy_state_dict(model.attention.state_dict()),
        }
        tree = convert_gram_attention_checkpoint(ckpt)
        with torch.no_grad():
            want_emb, want_logits = model(torch.from_numpy(image_batch))
        emb, logits, _ = gram_attention_apply(
            tree, _jx(image_batch), truncate=truncate,
            gram_matrix_size=gram_size, num_classes=4,
        )
        np.testing.assert_allclose(
            np.asarray(emb), want_emb.numpy(), rtol=5e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(logits), want_logits.numpy(), rtol=5e-3, atol=5e-3
        )

    def test_raw_torchvision_checkpoint(self, torch_resnet):
        """Strategy (b): a bare resnet state_dict loads as encoder-only."""
        tree = convert_gram_attention_checkpoint(
            to_numpy_state_dict(torch_resnet.state_dict())
        )
        assert "encoder" in tree and "fc" not in tree["encoder"]
        assert "classifier" not in tree


class TestMultiPatchGANParity:
    @pytest.mark.parametrize("norm", ["instance", "batch"])
    def test_test_variant(self, norm):
        from Models.Models_Multi_PatchGAN import MultiScaleDiscriminator_test

        torch.manual_seed(5)
        patch_sizes = {"small": 10, "medium": 70, "large": 150}
        model = MultiScaleDiscriminator_test(
            input_nc=3, ndf=64, norm=norm, patch_sizes=patch_sizes,
            num_classes=4, gram_matrix_dim=64,
        )
        model.eval()
        rng = np.random.RandomState(6)
        x = rng.randn(2, 3, 128, 128).astype(np.float32)
        with torch.no_grad():
            want_emb, want_logits = model(torch.from_numpy(x))
        tree = convert_multi_patchgan_test_checkpoint(
            to_numpy_state_dict(model.state_dict()), patch_sizes, ndf=64, norm=norm,
        )
        emb, logits, gram_norms = multiscale_test_apply(
            tree, _jx(x), gram_matrix_dim=64, norm=norm
        )
        np.testing.assert_allclose(
            np.asarray(emb), want_emb.numpy(), rtol=5e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(logits), want_logits.numpy(), rtol=5e-3, atol=5e-3
        )
        want_norms = [g.numpy() for g in model.get_gram_norms()]
        assert len(gram_norms) == len(want_norms)
        for got_n, want_n in zip(gram_norms, want_norms):
            np.testing.assert_allclose(np.asarray(got_n), want_n, rtol=5e-3, atol=5e-3)

    @pytest.mark.parametrize("norm", ["instance", "batch"])
    def test_train_variant(self, norm):
        from Models.Models_Multi_PatchGAN import MultiScaleDiscriminator

        torch.manual_seed(7)
        patch_sizes = {"small": 16, "medium": 70, "large": 112}
        model = MultiScaleDiscriminator(
            input_nc=3, ndf=64, norm=norm, patch_sizes=patch_sizes, num_classes=4
        )
        model.eval()
        rng = np.random.RandomState(8)
        # 256px input: after two inter-scale downsamples the large scale still
        # has >1 spatial element (torch instance-norm rejects 1x1 maps)
        x = rng.randn(2, 3, 256, 256).astype(np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(x)).numpy()
        from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
            convert_multi_patchgan_checkpoint,
        )
        from heuristique_style_transfer_code_tpu.models import multiscale_apply

        tree = convert_multi_patchgan_checkpoint(
            to_numpy_state_dict(model.state_dict()), patch_sizes, ndf=64, norm=norm,
        )
        got, _ = multiscale_apply(tree, _jx(x), norm=norm)
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)
