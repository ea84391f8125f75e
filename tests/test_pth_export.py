"""Reverse-export round trips: native pytrees -> reference .pth layouts,
consumed by the ACTUAL reference loader functions / strict torch loads, with
logit equality between the torch model (now carrying our weights) and the JAX
model (VERDICT r1 #5)."""
import sys
import types

import numpy as np
import pytest
import torch
import torch.nn as nn
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tests.torch_ref import randomized_resnet50

from heuristique_style_transfer_code_tpu.checkpoint.pth_exporter import (
    export_gram_attention_checkpoint,
    export_moco_checkpoint,
    export_multi_patchgan_checkpoint,
    export_multi_patchgan_test_checkpoint,
    save_pth,
)


def _jx(x_nchw: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(x_nchw.transpose(0, 2, 3, 1))


def _stub_module(name, **attrs):
    m = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(m, k, v)
    sys.modules.setdefault(name, m)
    return sys.modules[name]


@pytest.fixture(scope="module")
def reference_f1_functions():
    """Import the reference's functions_RESNET50_Truncate with its unavailable
    third-party deps (torchvision / pytorch_grad_cam / pykalman) stubbed —
    we only call load_best_model, which touches none of them."""
    tv = _stub_module(
        "torchvision",
        datasets=_stub_module("torchvision.datasets", folder=types.SimpleNamespace(default_loader=None)),
        transforms=_stub_module("torchvision.transforms"),
        models=_stub_module("torchvision.models"),
    )
    del tv
    gc = _stub_module("pytorch_grad_cam", GradCAM=object)
    del gc
    _stub_module("pytorch_grad_cam.utils")
    _stub_module("pytorch_grad_cam.utils.model_targets", ClassifierOutputTarget=object)
    _stub_module("pytorch_grad_cam.utils.image", show_cam_on_image=None)
    _stub_module("pykalman", KalmanFilter=object)
    _stub_module("screeninfo", get_monitors=lambda: [])
    from functions import functions_RESNET50_Truncate as f

    return f


class TestFamily1Export:
    def test_reference_load_best_model_consumes_export(
        self, reference_f1_functions, monkeypatch, tmp_path
    ):
        from Models.Models_RESNET50_TRUNCATE import Classifier, TruncatedMoCoV3

        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_apply,
            classifier_init,
            truncated_moco_apply,
            truncated_moco_init,
        )

        truncate, dim = 6, 16
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        tree = {
            "moco": truncated_moco_init(k1, truncate, dim=dim),
            "classifier": classifier_init(k2, dim, 4),
        }
        path = str(tmp_path / "export.pth")
        save_pth(export_moco_checkpoint(tree), path)

        torch.manual_seed(0)
        moco = TruncatedMoCoV3(
            randomized_resnet50(seed=1), truncate_after_layer=truncate,
            dim=dim, device="cpu",
        )
        clf = Classifier(input_dim=dim, num_classes=4)
        # load_best_model ends with .cuda(); this image is CPU-only torch
        monkeypatch.setattr(nn.Module, "cuda", lambda self, *a, **k: self)
        reference_f1_functions.load_best_model(clf, moco, path)
        moco.eval()
        clf.eval()

        rng = np.random.RandomState(2)
        x = rng.randn(2, 3, 96, 96).astype(np.float32)
        with torch.no_grad():
            want = clf(moco(torch.from_numpy(x))).numpy()
        emb, _ = truncated_moco_apply(tree["moco"], _jx(x), truncate=truncate)
        got = classifier_apply(tree["classifier"], emb)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


class TestFamily2Export:
    def test_reference_load_model_weights_consumes_export(self, tmp_path, capsys):
        from functions import functions_RESNET50_Truncate_Gram_Attention as f2
        from Models.Models_RESNET50_TRUNCATE_GRAM_with_Attention import (
            TruncatedResNet50_for_test,
        )

        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_apply,
            gram_attention_init,
        )

        truncate, gram_size = 6, 4
        tree = gram_attention_init(jax.random.PRNGKey(3), truncate, 4, gram_size)
        path = str(tmp_path / "export_f2.pth")
        save_pth(export_gram_attention_checkpoint(tree), path)

        torch.manual_seed(4)
        model = TruncatedResNet50_for_test(
            randomized_resnet50(seed=5), truncate_after_layer=truncate,
            num_classes=4, gram_matrix_size=gram_size, device="cpu",
        )
        f2.load_model_weights(model, path)
        # the strict direct path must succeed — no key-processing fallback
        out = capsys.readouterr().out
        assert "using direct method" in out
        model.eval()

        rng = np.random.RandomState(6)
        x = rng.randn(2, 3, 96, 96).astype(np.float32)
        with torch.no_grad():
            want_emb, want_logits = model(torch.from_numpy(x))
        emb, logits, _ = gram_attention_apply(
            tree, _jx(x), truncate=truncate,
            gram_matrix_size=gram_size, num_classes=4,
        )
        np.testing.assert_allclose(
            np.asarray(logits), want_logits.numpy(), rtol=5e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(emb), want_emb.numpy(), rtol=5e-3, atol=5e-3
        )


class TestFamily3Export:
    @pytest.mark.parametrize("norm", ["instance", "batch"])
    def test_train_variant_strict_load(self, norm, tmp_path):
        from Models.Models_Multi_PatchGAN import MultiScaleDiscriminator

        from heuristique_style_transfer_code_tpu.models.multi_patchgan import (
            multiscale_apply,
            multiscale_init,
        )

        patch_sizes = {"small": 10, "medium": 16, "large": 20}
        tree = multiscale_init(
            jax.random.PRNGKey(7), patch_sizes, ndf=16, num_classes=4, norm=norm
        )
        path = str(tmp_path / "export_f3.pth")
        save_pth(export_multi_patchgan_checkpoint(tree, norm=norm), path)

        torch.manual_seed(8)
        model = MultiScaleDiscriminator(
            input_nc=3, ndf=16, norm=norm, patch_sizes=patch_sizes, num_classes=4
        )
        sd = torch.load(path, map_location="cpu", weights_only=False)
        model.load_state_dict(sd, strict=True)  # the reference's consumption path
        model.eval()

        rng = np.random.RandomState(9)
        x = rng.randn(2, 3, 256, 256).astype(np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(x)).numpy()
        got, _ = multiscale_apply(tree, _jx(x), norm=norm)
        np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-3)

    @pytest.mark.parametrize("norm", ["instance", "batch"])
    def test_test_variant_strict_load(self, norm, tmp_path):
        from Models.Models_Multi_PatchGAN import MultiScaleDiscriminator_test

        from heuristique_style_transfer_code_tpu.models.multi_patchgan import (
            multiscale_test_apply,
            multiscale_test_init,
        )

        patch_sizes = {"small": 10, "medium": 16, "large": 20}
        tree = multiscale_test_init(
            jax.random.PRNGKey(10), patch_sizes, ndf=16, num_classes=4,
            gram_matrix_dim=16, norm=norm,
        )
        path = str(tmp_path / "export_f3t.pth")
        save_pth(export_multi_patchgan_test_checkpoint(tree, norm=norm), path)

        torch.manual_seed(11)
        model = MultiScaleDiscriminator_test(
            input_nc=3, ndf=16, norm=norm, patch_sizes=patch_sizes,
            num_classes=4, gram_matrix_dim=16,
        )
        sd = torch.load(path, map_location="cpu", weights_only=False)
        model.load_state_dict(sd, strict=True)
        model.eval()

        rng = np.random.RandomState(12)
        x = rng.randn(2, 3, 128, 128).astype(np.float32)
        with torch.no_grad():
            want_emb, want_logits = model(torch.from_numpy(x))
        emb, logits, _ = multiscale_test_apply(tree, _jx(x), gram_matrix_dim=16, norm=norm)
        np.testing.assert_allclose(
            np.asarray(logits), want_logits.numpy(), rtol=5e-3, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(emb), want_emb.numpy(), rtol=5e-3, atol=5e-3
        )


class TestConvertCLIReverse:
    def test_npz_to_pth_and_back(self, tmp_path):
        """convert_checkpoint --to pth, then .pth back through the ingest
        direction; trees must match exactly."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
            convert_moco_checkpoint,
        )
        from heuristique_style_transfer_code_tpu.cli.convert_checkpoint import main
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            truncated_moco_init,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(13))
        tree = {
            "moco": truncated_moco_init(k1, 5, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }
        npz = str(tmp_path / "m.npz")
        pth = str(tmp_path / "m.pth")
        save_pytree_npz(tree, npz)
        main(["--family", "truncated_resnet50", "--input", npz, "--output", pth])
        back = convert_moco_checkpoint(pth)

        want = jax.tree_util.tree_leaves(load_pytree_npz(npz, as_jax=False))
        got = jax.tree_util.tree_leaves(back)
        assert len(want) == len(got)
        for w, g in zip(want, got):
            np.testing.assert_array_equal(np.asarray(w), np.asarray(g))
