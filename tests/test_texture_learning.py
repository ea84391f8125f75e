"""Substantive validation: the gram-attention family learns *texture*
classes (sinusoid frequency/orientation) — the exact signal Gram features
encode and the reason the reference uses them for weather classification.

Slow (~4 min on CPU): opt in with RUN_SLOW=1. Last measured: 0.75 test
accuracy after 15 epochs from scratch (chance = 0.25)."""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("RUN_SLOW") != "1", reason="slow; set RUN_SLOW=1"
)


@pytest.fixture(scope="module")
def textured_imagefolder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("textures")
    rng = np.random.RandomState(0)

    def make(ci):
        h, w = 96, 128
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        freq = [0.15, 0.45, 0.15, 0.45][ci]
        theta = [0.0, 0.0, np.pi / 3, np.pi / 3][ci]
        phase = rng.rand() * 6.28
        wave = np.sin(freq * (xx * np.cos(theta) + yy * np.sin(theta)) + phase)
        img = 127 + 80 * wave[..., None] + rng.randn(h, w, 3) * 15
        return np.clip(img, 0, 255).astype(np.uint8)

    for split, n in (("train", 24), ("test", 8)):
        for ci, cls in enumerate(["fog", "rain", "snow", "sun"]):
            d = root / split / cls
            d.mkdir(parents=True)
            for i in range(n):
                Image.fromarray(make(ci)).save(d / f"img_{i:03d}.png")
    return root


def test_gram_attention_learns_textures(textured_imagefolder):
    import jax

    from heuristique_style_transfer_code_tpu.config.schema import GramAttentionConfig
    from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
    from heuristique_style_transfer_code_tpu.data.loader import HostLoader
    from heuristique_style_transfer_code_tpu.train.factories import setup_gram_attention
    from heuristique_style_transfer_code_tpu.train.train_loop import evaluate, train_epochs

    cfg = GramAttentionConfig(
        batch_size=16, lr=0.01, truncate_layer=5, gram_matrix_size=7, num_classes=4
    )
    setup = setup_gram_attention(cfg, 4, [(None, None)])
    v, o = setup.init(jax.random.PRNGKey(0))
    train_idx = ImageFolderIndex(str(textured_imagefolder / "train"))
    test_idx = ImageFolderIndex(str(textured_imagefolder / "test"))
    loader = HostLoader(train_idx.samples, 16, shuffle=True, seed=0)
    v, o = train_epochs(
        setup.train_step, v, o, loader, 15, jax.random.PRNGKey(1), verbose_batches=False
    )
    res = evaluate(setup.eval_step, v, HostLoader(test_idx.samples, 16), 4)
    assert res["val_accuracy"] >= 0.5, res  # chance is 0.25
