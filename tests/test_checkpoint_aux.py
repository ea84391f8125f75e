"""Checkpoint backends (atomic npz, orbax), shape-filter stats, M4 train
variant parity, and affine-warp correctness."""
import os
import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp


class TestAtomicNpz:
    def test_no_tmp_left_behind(self, tmp_path):
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
            save_pytree_npz,
        )

        p = str(tmp_path / "model.npz")
        tree = {"w": np.arange(6.0).reshape(2, 3)}
        save_pytree_npz(tree, p)
        save_pytree_npz(tree, p)  # overwrite is atomic too
        assert [f for f in os.listdir(tmp_path) if f.endswith(".tmp")] == []
        back = load_pytree_npz(p, as_jax=False)
        np.testing.assert_array_equal(back["w"], tree["w"])

    def test_empty_containers_and_none_round_trip(self, tmp_path):
        """Empty dict/list subtrees (e.g. 'convs': [] from a 1-layer
        discriminator plan) and None leaves must survive the npz round
        trip — dropping them breaks later tree lookups on resume."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
            save_pytree_npz,
        )

        p = str(tmp_path / "model.npz")
        tree = {
            "convs": [],
            "stats": {},
            "head": {"w": np.ones((2, 2)), "b": None, "groups": [np.zeros(3), []]},
        }
        save_pytree_npz(tree, p)
        back = load_pytree_npz(p, as_jax=False)
        assert back["convs"] == []
        assert back["stats"] == {}
        assert back["head"]["b"] is None
        assert back["head"]["groups"][1] == []
        np.testing.assert_array_equal(back["head"]["w"], tree["head"]["w"])
        np.testing.assert_array_equal(back["head"]["groups"][0], np.zeros(3))


class TestOrbax:
    def test_roundtrip(self, tmp_path):
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_orbax,
            save_pytree_orbax,
        )

        tree = {
            "a": {"kernel": jnp.ones((2, 3)), "bias": jnp.zeros(3)},
            "blocks": [{"w": jnp.full((2,), 7.0)}],
        }
        p = str(tmp_path / "orbax_ckpt")
        save_pytree_orbax(tree, p)
        back = load_pytree_orbax(p, like=jax.tree_util.tree_map(np.asarray, tree))
        np.testing.assert_array_equal(np.asarray(back["a"]["kernel"]), np.ones((2, 3)))
        np.testing.assert_array_equal(np.asarray(back["blocks"][0]["w"]), np.full(2, 7.0))


class TestShapeFilterStats:
    def test_match_fraction_reported(self):
        from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
            shape_filtered_update,
        )

        target = {"a": np.zeros((2, 2)), "b": np.zeros(3), "c": np.zeros(4)}
        source = {"a": np.ones((2, 2)), "b": np.ones(9)}
        stats = {}
        out = shape_filtered_update(target, source, stats)
        assert stats == {"loaded": 1, "total": 3}
        assert (out["a"] == 1).all() and (out["b"] == 0).all()

    def test_tuple_subtrees_keep_their_type(self):
        from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
            shape_filtered_update,
        )

        target = {"seq": (np.zeros(2), np.zeros(3))}
        source = {"seq": [np.ones(2), np.ones(9)]}
        out = shape_filtered_update(target, source)
        assert isinstance(out["seq"], tuple)  # pytree structure unchanged
        assert (out["seq"][0] == 1).all() and (out["seq"][1] == 0).all()


class TestGramAttentionTrainVariantParity:
    def test_m4_logits_match_reference(self):
        """M4 (train variant, logits only) vs the imported reference class."""
        sys.path.insert(0, "/root/reference")
        import torch

        from Models.Models_RESNET50_TRUNCATE_GRAM_with_Attention import TruncatedResNet50
        from tests.torch_ref import randomized_resnet50

        from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
            convert_gram_attention_checkpoint,
            to_numpy_state_dict,
        )
        from heuristique_style_transfer_code_tpu.models.gram_attention import (
            gram_attention_apply,
        )

        base = randomized_resnet50(seed=21)
        torch.manual_seed(22)
        model = TruncatedResNet50(
            base, truncate_after_layer=6, num_classes=4, gram_matrix_size=5, device="cpu"
        )
        model.eval()
        rng = np.random.RandomState(23)
        x = rng.randn(2, 3, 224, 224).astype(np.float32)
        with torch.no_grad():
            want = model(torch.from_numpy(x)).numpy()
        tree = convert_gram_attention_checkpoint(
            {
                "truncated_encoder": to_numpy_state_dict(model.truncated_encoder.state_dict()),
                "classifier": to_numpy_state_dict(model.classifier.state_dict()),
                "attention": to_numpy_state_dict(model.attention.state_dict()),
            }
        )
        _, logits, _ = gram_attention_apply(
            tree, jnp.asarray(x.transpose(0, 2, 3, 1)), truncate=6,
            gram_matrix_size=5, num_classes=4,
        )
        np.testing.assert_allclose(np.asarray(logits), want, rtol=5e-3, atol=5e-3)


class TestAffineWarp:
    def test_rotation_90_matches_pil_rotate(self):
        """Inverse-mapped bilinear warp at +-90 degrees must equal PIL's own
        Image.rotate exactly — the rotation center is now the PIL convention
        (w/2, h/2, r3 augmentation-parity change), so at 90 degrees on an
        odd-sized image the mapping is grid-aligned and bit-exact."""
        from PIL import Image

        from heuristique_style_transfer_code_tpu.data.augment import rotate_by

        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, (33, 33, 3), dtype=np.uint8)
        pil = Image.fromarray(img)
        for deg in (90.0, -90.0):
            out = np.asarray(rotate_by(jnp.asarray(img, jnp.float32) / 255.0, deg))
            gold = np.asarray(pil.rotate(deg, resample=Image.BILINEAR),
                              dtype=np.float32) / 255.0
            np.testing.assert_allclose(out, gold, atol=1e-5)

    def test_identity_rotation(self):
        from heuristique_style_transfer_code_tpu.data.augment import (
            _affine_warp,
            _rotation_matrix,
        )

        rng = np.random.RandomState(1)
        img = rng.rand(16, 24, 3).astype(np.float32)
        m, off = _rotation_matrix(jnp.deg2rad(0.0), 16, 24)
        out = np.asarray(_affine_warp(jnp.asarray(img), m, off))
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_scale_half_zooms_in(self):
        """scale > 1 in torchvision semantics zooms in (objects larger)."""
        from heuristique_style_transfer_code_tpu.data.augment import (
            _affine_warp,
            _rotation_matrix,
        )

        img = np.zeros((21, 21, 1), np.float32)
        img[10, 10, 0] = 1.0  # center dot
        m, off = _rotation_matrix(jnp.deg2rad(0.0), 21, 21, scale=2.0)
        out = np.asarray(_affine_warp(jnp.asarray(img), m, off))
        assert out[10, 10, 0] > 0.5  # center preserved
        assert out.sum() > img.sum()  # dot smeared over more pixels (zoomed)
