"""End-to-end .pth ingestion through the CLI surface: save a real torch
checkpoint in the reference's format, run the test CLI on it, and check the
predictions equal the torch model's own (the output-parity north star)."""
import json
import os

import numpy as np
import pytest
import torch

from tests.torch_ref import randomized_resnet50


@pytest.fixture(scope="module")
def reference_pth(tmp_path_factory):
    """best_global_model.pth in the reference's nested layout
    (functions_RESNET50_Truncate.py:129-141)."""
    import sys

    sys.path.insert(0, "/root/reference")
    from Models.Models_RESNET50_TRUNCATE import Classifier, TruncatedMoCoV3

    base = randomized_resnet50(seed=11)
    torch.manual_seed(12)
    moco = TruncatedMoCoV3(base, truncate_after_layer=5, dim=16, device="cpu")
    clf = Classifier(input_dim=16, num_classes=4)
    moco.eval()
    clf.eval()
    d = tmp_path_factory.mktemp("pth")
    path = str(d / "best_global_model.pth")
    torch.save(
        {
            "moco_model_state_dict": moco.state_dict(),
            "classifier_state_dict": clf.state_dict(),
        },
        path,
    )
    cfg = str(d / "cfg.json")
    with open(cfg, "w") as f:
        json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5, "dim": 16, "seed": 0}, f)
    return path, cfg, moco, clf


def test_pth_classification_matches_torch(tiny_imagefolder, reference_pth, tmp_path):
    from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

    pth, cfg, moco, clf = reference_pth
    out = str(tmp_path / "res")
    main([
        "--data", str(tiny_imagefolder), "--config_path", cfg,
        "--model_path", pth, "--mode", "classification",
        "--save_dir", out, "--batch_size", "4", "--prob_threshold", "0.0",
    ])
    assert os.path.exists(os.path.join(out, "metrics.txt"))

    # torch golden predictions over the same (sorted) test set with the
    # same staged-decode preprocessing
    from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
    from heuristique_style_transfer_code_tpu.data.loader import load_image_staged

    idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    want = []
    with torch.no_grad():
        for p, y in idx.samples:
            arr = load_image_staged(p)  # 256x256 uint8
            x = torch.from_numpy(arr[16:240, 16:240].copy()).permute(2, 0, 1).float() / 255
            x = ((x - mean) / std).unsqueeze(0)
            logits = clf(moco(x))
            want.append(int(logits.argmax()))

    # compare to the CLI's confusion matrix (prob_threshold 0 -> no Unknown)
    from sklearn.metrics import confusion_matrix

    want_cm = confusion_matrix(idx.labels, want, labels=[0, 1, 2, 3])
    with open(os.path.join(out, "metrics.txt")) as f:
        metrics = f.read()
    got_cm = metrics.split("Matrice de confusion:\n")[1]
    got = np.array(
        [[int(v) for v in row.strip("[] ").split()] for row in got_cm.strip().splitlines()]
    )
    np.testing.assert_array_equal(got, want_cm)


def test_pth_embeddings_close_to_torch(tiny_imagefolder, reference_pth):
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
        convert_moco_checkpoint,
    )
    from heuristique_style_transfer_code_tpu.data.augment import eval_preprocess
    from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
    from heuristique_style_transfer_code_tpu.data.loader import load_image_staged
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        truncated_moco_apply,
    )

    pth, cfg, moco, clf = reference_pth
    tree = convert_moco_checkpoint(pth)
    idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
    arr = np.stack([load_image_staged(p) for p, _ in idx.samples[:4]])
    emb, _ = truncated_moco_apply(tree["moco"], eval_preprocess(jnp.asarray(arr)), 5)

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    x = torch.from_numpy(arr[:, 16:240, 16:240].copy()).permute(0, 3, 1, 2).float() / 255
    x = (x - mean) / std
    with torch.no_grad():
        want = moco(x).numpy()
    np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-3, atol=1e-3)


def test_convert_checkpoint_cli(reference_pth, tmp_path):
    """Offline .pth -> .npz conversion, then the npz drives the model."""
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.checkpoint.io import load_pytree_npz
    from heuristique_style_transfer_code_tpu.cli.convert_checkpoint import main
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        truncated_moco_apply,
    )

    pth, cfg, moco, clf = reference_pth
    out = str(tmp_path / "converted.npz")
    main(["--family", "truncated_resnet50", "--input", pth, "--output", out])
    tree = load_pytree_npz(out)
    emb, _ = truncated_moco_apply(tree["moco"], jnp.ones((1, 224, 224, 3)), 5)
    import torch

    with torch.no_grad():
        want = moco(torch.ones(1, 3, 224, 224)).numpy()
    np.testing.assert_allclose(np.asarray(emb), want, rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def reference_pth_f2(tmp_path_factory):
    """Family-2 component-dict .pth (save_model_weights layout,
    functions_RESNET50_Truncate_Gram_Attention.py:62-69)."""
    import sys

    sys.path.insert(0, "/root/reference")
    from Models.Models_RESNET50_TRUNCATE_GRAM_with_Attention import (
        TruncatedResNet50_for_test,
    )

    base = randomized_resnet50(seed=21)
    torch.manual_seed(22)
    model = TruncatedResNet50_for_test(
        base, truncate_after_layer=5, num_classes=4, gram_matrix_size=4,
        device="cpu",
    )
    model.eval()
    d = tmp_path_factory.mktemp("pth_f2")
    path = str(d / "model_weights.pth")
    torch.save(
        {
            "truncated_encoder": model.truncated_encoder.state_dict(),
            "classifier": model.classifier.state_dict(),
            "attention": model.attention.state_dict(),
        },
        path,
    )
    cfg = str(d / "cfg.json")
    with open(cfg, "w") as f:
        json.dump(
            {"batch_size": 4, "lr": 0.01, "truncate_layer": 5, "seed": 0,
             "gram_matrix_size": 4, "num_classes": 4},
            f,
        )
    return path, cfg, model


def _torch_preds(idx, forward):
    """Golden predictions over the sorted test set with the CLI's exact
    staged-decode preprocessing."""
    from heuristique_style_transfer_code_tpu.data.loader import load_image_staged

    mean = torch.tensor([0.485, 0.456, 0.406]).view(3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(3, 1, 1)
    preds = []
    with torch.no_grad():
        for p, y in idx.samples:
            arr = load_image_staged(p)
            x = torch.from_numpy(arr[16:240, 16:240].copy()).permute(2, 0, 1).float() / 255
            x = ((x - mean) / std).unsqueeze(0)
            preds.append(int(forward(x).argmax()))
    return preds


def test_pth_gram_attention_cli_matches_torch(tiny_imagefolder, reference_pth_f2, tmp_path):
    """Family-2 north-star surrogate: reference-format .pth -> family-2 CLI
    classification reproduces the torch model's own weighted P/R/F1."""
    from sklearn.metrics import f1_score, precision_score, recall_score

    from heuristique_style_transfer_code_tpu.cli.test_gram_attention import main
    from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex

    pth, cfg, model = reference_pth_f2
    out = str(tmp_path / "res")
    main([
        "--data", str(tiny_imagefolder), "--config_path", cfg,
        "--model_path", pth, "--mode", "classification", "--save_dir", out,
    ])
    with open(os.path.join(out, "classification_results.json")) as f:
        got = json.load(f)

    idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
    want = _torch_preds(idx, lambda x: model(x)[1])
    kw = dict(average="weighted", zero_division=0)
    assert np.isclose(got["precision"], precision_score(idx.labels, want, **kw))
    assert np.isclose(got["recall"], recall_score(idx.labels, want, **kw))
    assert np.isclose(got["f1_score"], f1_score(idx.labels, want, **kw))


@pytest.fixture(scope="module")
def reference_pth_f3(tmp_path_factory):
    """Family-3 flat state_dict .pth — the layout test_Multi_PatchGAN.py
    loads directly."""
    import sys

    sys.path.insert(0, "/root/reference")
    from Models.Models_Multi_PatchGAN import MultiScaleDiscriminator_test

    torch.manual_seed(23)
    patch_sizes = {"small": 10, "medium": 34, "large": 70}
    model = MultiScaleDiscriminator_test(
        input_nc=3, ndf=16, norm="instance", patch_sizes=patch_sizes,
        num_classes=4, gram_matrix_dim=8,
    )
    model.eval()
    d = tmp_path_factory.mktemp("pth_f3")
    path = str(d / "discriminator.pth")
    torch.save(model.state_dict(), path)
    cfg = str(d / "cfg.json")
    with open(cfg, "w") as f:
        json.dump(
            {"batch_size": 4, "patch_sizes": patch_sizes, "num_classes": 4,
             "gram_matrix_dim": 8, "ndf": 16, "norm": "instance", "seed": 0},
            f,
        )
    return path, cfg, model


def test_pth_multi_patchgan_cli_matches_torch(tiny_imagefolder, reference_pth_f3, tmp_path):
    """Family-3 north-star surrogate: reference flat state_dict ->
    family-3 CLI classification reproduces the torch model's own raw
    PREDICTIONS (the CLI exports them)."""
    from heuristique_style_transfer_code_tpu.cli.test_multi_patchgan import main
    from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex

    pth, cfg, model = reference_pth_f3
    out = str(tmp_path / "res")
    main([
        "--data", str(tiny_imagefolder), "--config_path", cfg,
        "--model_path", pth, "--mode", "classification", "--save_dir", out,
    ])
    with open(os.path.join(out, "classification_results.json")) as f:
        got = json.load(f)

    idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
    want = _torch_preds(idx, lambda x: model(x)[1])
    assert got["predictions"] == want
    assert got["labels"] == list(idx.labels)
