"""Grad-CAM numerical parity: our functional split-forward CAM vs a manual
torch hook implementation (pytorch_grad_cam's GradCAM algorithm: GAP of
gradients as channel weights, ReLU, per-image min-max normalisation) using
the same converted weights."""
import sys

import numpy as np
import pytest
import torch
import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

from tests.torch_ref import randomized_resnet50


@pytest.fixture(scope="module")
def models():
    from Models.Models_RESNET50_TRUNCATE import Classifier, TruncatedMoCoV3

    base = randomized_resnet50(seed=31)
    torch.manual_seed(32)
    moco = TruncatedMoCoV3(base, truncate_after_layer=5, dim=16, device="cpu")
    clf = Classifier(input_dim=16, num_classes=4)
    moco.eval()
    clf.eval()

    from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
        convert_moco_checkpoint,
        to_numpy_state_dict,
    )

    tree = convert_moco_checkpoint(
        {
            "moco_model_state_dict": to_numpy_state_dict(moco.state_dict()),
            "classifier_state_dict": to_numpy_state_dict(clf.state_dict()),
        }
    )
    return moco, clf, tree


def torch_gradcam(moco, clf, x_nchw, target):
    """Manual hook-based GradCAM on the last block's conv3 of the last
    truncated stage (the reference's target layer choice,
    functions_RESNET50_Truncate.py:779-784, generalised to the truncation)."""
    acts, grads = {}, {}
    # truncate=5 -> children [conv1,bn1,relu,maxpool,layer1]; target =
    # layer1[-1].conv3
    target_layer = moco.truncated_encoder[4][-1].conv3

    h1 = target_layer.register_forward_hook(lambda m, i, o: acts.update(a=o))
    h2 = target_layer.register_full_backward_hook(
        lambda m, gi, go: grads.update(g=go[0])
    )
    try:
        x = torch.from_numpy(x_nchw).requires_grad_(True)
        logits = clf(moco(x))
        score = logits[:, target].sum()
        score.backward()
    finally:
        h1.remove()
        h2.remove()
    a, g = acts["a"].detach().numpy(), grads["g"].detach().numpy()
    weights = g.mean(axis=(2, 3), keepdims=True)
    cam = np.maximum((weights * a).sum(axis=1), 0.0)
    lo = cam.min(axis=(1, 2), keepdims=True)
    hi = cam.max(axis=(1, 2), keepdims=True)
    return (cam - lo) / np.maximum(hi - lo, 1e-7)


def test_cam_matches_torch_hooks(models):
    from heuristique_style_transfer_code_tpu.tasks.gradcam import _cam_for_moco

    moco, clf, tree = models
    rng = np.random.RandomState(33)
    x = rng.randn(2, 3, 224, 224).astype(np.float32)
    want = torch_gradcam(moco, clf, x, target=1)
    got = np.asarray(
        _cam_for_moco(
            tree | {"moco": tree["moco"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            jnp.asarray([1, 1]),
            truncate=5,
        )
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)
