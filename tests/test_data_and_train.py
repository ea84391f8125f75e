"""Data pipeline + training engine tests on the synthetic ImageFolder."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
from heuristique_style_transfer_code_tpu.data.loader import HostLoader, load_image_staged
from heuristique_style_transfer_code_tpu.data.augment import (
    generate_transform_combinations,
    make_augment_fn,
)


class TestImageFolder:
    def test_discovery(self, tiny_imagefolder):
        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        assert idx.classes == ["fog", "rain", "snow", "sun"]
        assert len(idx) == 24
        assert idx.samples_per_class() == {c: 6 for c in idx.classes}

    def test_subset(self, tiny_imagefolder):
        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        sub = idx.subset([0, 5, 10])
        assert len(sub) == 3
        assert sub.classes == idx.classes


class TestHostLoader:
    def test_batch_shapes_and_padding(self, tiny_imagefolder):
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))  # 12 samples
        loader = HostLoader(idx.samples, batch_size=8, shuffle=False)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["image"].shape == (8, 256, 256, 3)
        assert batches[0]["n_valid"] == 8
        assert batches[1]["n_valid"] == 4
        assert (batches[1]["label"][4:] == -1).all()

    def test_staged_decode_matches_pil_pipeline(self, tiny_imagefolder):
        idx = ImageFolderIndex(str(tiny_imagefolder / "test"))
        arr = load_image_staged(idx.samples[0][0])
        assert arr.shape == (256, 256, 3) and arr.dtype == np.uint8


class TestAugment:
    def test_combination_product(self):
        combos = generate_transform_combinations(
            ["horizontal_flip", None], ["brightness", "grayscale", None]
        )
        assert len(combos) == 6

    @pytest.mark.parametrize(
        "combo",
        [
            (None, None),
            ("horizontal_flip", None),
            ("vertical_flip", "grayscale"),
            ("rotation", "brightness"),
            ("affine", "hue"),
            ("resized_crop", "saturation"),
            (None, "contrast"),
        ],
    )
    def test_each_transform_runs(self, combo):
        fn = make_augment_fn([combo])
        imgs = np.random.RandomState(0).randint(0, 256, (2, 256, 256, 3), dtype=np.uint8)
        out = fn(jnp.asarray(imgs), jnp.zeros(2, jnp.int32), jax.random.PRNGKey(0))
        assert out.shape == (2, 224, 224, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_flip_is_exact(self):
        fn = make_augment_fn([("horizontal_flip", None)])
        imgs = np.random.RandomState(0).randint(0, 256, (1, 256, 256, 3), dtype=np.uint8)
        out = np.asarray(
            fn(jnp.asarray(imgs), jnp.zeros(1, jnp.int32), jax.random.PRNGKey(0))
        )
        ident = make_augment_fn([(None, None)])
        base = np.asarray(
            ident(jnp.asarray(imgs), jnp.zeros(1, jnp.int32), jax.random.PRNGKey(0))
        )
        np.testing.assert_allclose(out, base[:, :, ::-1, :], atol=1e-6)

    def test_switch_dispatch(self):
        combos = [(None, None), ("horizontal_flip", None)]
        fn = make_augment_fn(combos)
        imgs = np.random.RandomState(0).randint(0, 256, (2, 256, 256, 3), dtype=np.uint8)
        imgs[1] = imgs[0]
        out = np.asarray(
            fn(jnp.asarray(imgs), jnp.asarray([0, 1], jnp.int32), jax.random.PRNGKey(0))
        )
        np.testing.assert_allclose(out[1], out[0][:, ::-1, :], atol=1e-6)


class TestAugmentParity:
    """Fixed-parameter parity of every augmentation kernel against the
    pipeline the reference actually runs — torchvision transforms applied to
    PIL images (train_best_RESNET50_Truncate.py:72-88), i.e. ImageEnhance /
    Image.rotate / Image.transform(AFFINE) / crop+resize, all golden via PIL
    itself (torchvision is not installed in this image; the PIL path is what
    its transforms delegate to for PIL inputs). Random draws are separated
    from the deterministic kernels (data/augment.py adjust_*/rotate_by/
    affine_by/resized_crop_box) so parameters can be pinned.

    Tolerances: PIL quantises to uint8 at every step (1 LSB = 1/255 ~ 0.004)
    and its bilinear warp differs from map_coordinates at border blending,
    so geometric comparisons trim the fill-affected border ring."""

    @pytest.fixture(scope="class")
    def golden_img(self):
        from PIL import Image

        rng = np.random.RandomState(7)
        base = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
        # smooth content: bilinear-vs-bilinear deltas dominate, not noise
        u8 = np.asarray(Image.fromarray(base).resize((64, 64), Image.BILINEAR))
        return u8, u8.astype(np.float32) / 255.0, Image.fromarray(u8)

    @staticmethod
    def _assert_close(ours, gold_pil_img, atol, trim=0):
        gold = np.asarray(gold_pil_img, dtype=np.float32) / 255.0
        ours = np.asarray(ours, dtype=np.float32)
        if trim:
            ours, gold = ours[trim:-trim, trim:-trim], gold[trim:-trim, trim:-trim]
        d = np.abs(ours - gold)
        assert d.max() <= atol, (d.mean(), d.max())

    @pytest.mark.parametrize("factor", [0.5, 0.8, 1.3, 1.5])
    def test_brightness_matches_imageenhance(self, golden_img, factor):
        from PIL import ImageEnhance

        from heuristique_style_transfer_code_tpu.data.augment import adjust_brightness

        _, img, pil = golden_img
        self._assert_close(
            adjust_brightness(jnp.asarray(img), factor),
            ImageEnhance.Brightness(pil).enhance(factor),
            atol=0.006,  # PIL rounds each output pixel to uint8
        )

    @pytest.mark.parametrize("factor", [0.5, 0.7, 1.2, 1.5])
    def test_contrast_matches_imageenhance(self, golden_img, factor):
        from PIL import ImageEnhance

        from heuristique_style_transfer_code_tpu.data.augment import adjust_contrast

        _, img, pil = golden_img
        self._assert_close(
            adjust_contrast(jnp.asarray(img), factor),
            ImageEnhance.Contrast(pil).enhance(factor),
            atol=0.008,  # + PIL rounds the luma mean to an integer
        )

    @pytest.mark.parametrize("factor", [0.5, 0.9, 1.4, 1.5])
    def test_saturation_matches_imageenhance(self, golden_img, factor):
        from PIL import ImageEnhance

        from heuristique_style_transfer_code_tpu.data.augment import adjust_saturation

        _, img, pil = golden_img
        self._assert_close(
            adjust_saturation(jnp.asarray(img), factor),
            ImageEnhance.Color(pil).enhance(factor),
            atol=0.008,  # + PIL quantises the grayscale blend target
        )

    @pytest.mark.parametrize("shift", [0.1, -0.1, 0.05, -0.03])
    def test_hue_matches_pil_hsv_roundtrip(self, golden_img, shift):
        """Golden = torchvision's F_pil.adjust_hue algorithm: uint8 HSV
        roundtrip with wraparound add on the H channel. Our kernel does the
        same shift in float HSV — deltas are PIL's HSV quantisation."""
        from PIL import Image

        from heuristique_style_transfer_code_tpu.data.augment import adjust_hue

        _, img, pil = golden_img
        h, s, v = pil.convert("HSV").split()
        np_h = np.array(h, dtype=np.uint8)
        np_h = ((np_h.astype(np.int32) + int(shift * 255)) % 256).astype(np.uint8)
        gold = Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v)).convert("RGB")
        ours = np.asarray(adjust_hue(jnp.asarray(img), shift), dtype=np.float32)
        d = np.abs(ours - np.asarray(gold, dtype=np.float32) / 255.0)
        # uint8 hue resolution is 1/255 turn; a 1-LSB hue error moves a
        # saturated channel by up to ~6/255
        assert d.mean() < 0.01 and np.quantile(d, 0.99) < 0.05, (d.mean(), d.max())

    @pytest.mark.parametrize("shift", [0.1, -0.1, 0.04])
    def test_hue_matches_float_hsv_golden(self, shift):
        """Exact pin (1e-5) of the float-HSV algorithm against an
        independent torch implementation of torchvision's tensor
        _rgb2hsv/_hsv2rgb — much tighter than the uint8-quantised PIL
        comparison above."""
        import torch

        from heuristique_style_transfer_code_tpu.data.augment import adjust_hue

        def torch_adjust_hue(img, h_shift):  # img (H,W,3) float
            r, g, b = img.unbind(dim=-1)
            maxc = img.max(dim=-1).values
            minc = img.min(dim=-1).values
            eqc = maxc == minc
            cr = maxc - minc
            ones = torch.ones_like(maxc)
            s = cr / torch.where(eqc, ones, maxc)
            cr_div = torch.where(eqc, ones, cr)
            rc = (maxc - r) / cr_div
            gc = (maxc - g) / cr_div
            bc = (maxc - b) / cr_div
            hr = (maxc == r) * (bc - gc)
            hg = ((maxc == g) & (maxc != r)) * (2.0 + rc - bc)
            hb = ((maxc != g) & (maxc != r)) * (4.0 + gc - rc)
            h = torch.fmod((hr + hg + hb) / 6.0 + 1.0, 1.0)
            h = torch.fmod(h + h_shift + 1.0, 1.0)
            i = torch.floor(h * 6.0)
            f = h * 6.0 - i
            i = (i.to(torch.int64) % 6)
            v = maxc
            p = (v * (1 - s)).clamp(0, 1)
            q = (v * (1 - s * f)).clamp(0, 1)
            t = (v * (1 - s * (1 - f))).clamp(0, 1)
            a1 = torch.stack([v, q, p, p, t, v], dim=-1)
            a2 = torch.stack([t, v, v, q, p, p], dim=-1)
            a3 = torch.stack([p, p, t, v, v, q], dim=-1)
            onehot = torch.nn.functional.one_hot(i, 6).to(img.dtype)
            return torch.stack(
                [(a1 * onehot).sum(-1), (a2 * onehot).sum(-1), (a3 * onehot).sum(-1)],
                dim=-1,
            )

        rng = np.random.RandomState(9)
        img = rng.rand(32, 32, 3).astype(np.float32)
        ours = np.asarray(adjust_hue(jnp.asarray(img), shift))
        want = torch_adjust_hue(torch.from_numpy(img), shift).numpy()
        np.testing.assert_allclose(ours, want, atol=1e-5)

    def test_grayscale_matches_pil_convert_l(self, golden_img):
        from heuristique_style_transfer_code_tpu.data.augment import to_grayscale

        _, img, pil = golden_img
        self._assert_close(
            to_grayscale(jnp.asarray(img)),
            pil.convert("L").convert("RGB"),
            atol=0.006,
        )

    @staticmethod
    def _assert_close_masked(ours, gold_pil_img, atol):
        """Geometric comparison away from the fill boundary: PIL fills any
        output pixel whose bilinear support touches outside the source,
        while map_coordinates blends towards 0 — mask the boundary ring
        (erode the non-fill region) and require uint8-LSB agreement inside."""
        from scipy.ndimage import binary_erosion

        gold = np.asarray(gold_pil_img, dtype=np.float32) / 255.0
        ours = np.asarray(ours, dtype=np.float32)
        valid = binary_erosion(gold.sum(axis=-1) > 0, iterations=2)
        assert valid.mean() > 0.7  # the mask must cover most of the image
        d = np.abs(ours - gold)[valid]
        assert d.max() <= atol, (d.mean(), d.max())

    @pytest.fixture(scope="class")
    def noise_img(self):
        """Pure uint8 noise: maximal high-frequency content, so any
        sub-pixel grid offset shows up at full amplitude (a smooth image
        masked a half-pixel center bug once — r3)."""
        from PIL import Image

        rng = np.random.RandomState(11)
        u8 = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
        return u8.astype(np.float32) / 255.0, Image.fromarray(u8)

    @pytest.mark.parametrize("deg", [10.0, -15.0, 7.3])
    def test_rotation_matches_pil_rotate(self, noise_img, deg):
        """Golden = Image.rotate(deg, BILINEAR) — exactly what the
        reference's RandomRotation runs apart from its NEAREST default
        (bilinear upgrade documented in ARCHITECTURE.md). On pure noise the
        sampling grids must agree to the uint8 quantisation floor."""
        from PIL import Image

        from heuristique_style_transfer_code_tpu.data.augment import rotate_by

        img, pil = noise_img
        ours = rotate_by(jnp.asarray(img), deg)
        gold = pil.rotate(deg, resample=Image.BILINEAR)
        self._assert_close_masked(ours, gold, atol=0.005)

    @pytest.mark.parametrize("deg", [90.0, -90.0, 180.0])
    def test_rotation_quarter_turns_exact(self, deg):
        """Grid-aligned rotations on an odd-sized image are bit-exact vs
        PIL (pins the corner-vs-index center convention, r3 fix)."""
        from PIL import Image

        from heuristique_style_transfer_code_tpu.data.augment import rotate_by

        rng = np.random.RandomState(12)
        u8 = rng.randint(0, 256, (33, 33, 3), dtype=np.uint8)
        ours = rotate_by(jnp.asarray(u8, jnp.float32) / 255.0, deg)
        gold = (
            np.asarray(
                Image.fromarray(u8).rotate(deg, resample=Image.BILINEAR),
                dtype=np.float32,
            )
            / 255.0
        )
        np.testing.assert_allclose(np.asarray(ours), gold, atol=1e-5)

    @pytest.mark.parametrize(
        "deg,translate,scale",
        [(10.0, (5.0, -3.0), 1.0), (-8.0, (0.0, 0.0), 0.95), (15.0, (6.0, 6.0), 1.08)],
    )
    def test_affine_matches_torchvision_matrix(self, noise_img, deg, translate, scale):
        """Golden = Image.transform(AFFINE) with torchvision's
        _get_inverse_affine_matrix coefficients (center = (w/2, h/2) in
        PIL's pixel-corner coordinates = (w-1)/2 pixel-index, the PIL-path
        convention F.affine uses; note F.affine's positive angle is the
        opposite screen direction from Image.rotate's — preserved)."""
        import math

        from PIL import Image

        from heuristique_style_transfer_code_tpu.data.augment import affine_by

        img, pil = noise_img
        w, h = pil.size
        cx, cy = w * 0.5, h * 0.5
        tx, ty = translate
        rot = math.radians(deg)
        a, b = math.cos(rot), math.sin(rot)
        m = [a / scale, b / scale, 0.0, -b / scale, a / scale, 0.0]
        m[2] += m[0] * (-cx - tx) + m[1] * (-cy - ty)
        m[5] += m[3] * (-cx - tx) + m[4] * (-cy - ty)
        m[2] += cx
        m[5] += cy
        gold = pil.transform((w, h), Image.AFFINE, m, resample=Image.BILINEAR)
        ours = affine_by(jnp.asarray(img), deg, translate=translate, scale=scale)
        self._assert_close_masked(ours, gold, atol=0.005)

    @pytest.mark.parametrize(
        "box", [(8, 4, 48, 56), (0, 0, 52, 52), (10, 10, 44, 40)]
    )
    def test_resized_crop_matches_pil_crop_resize(self, golden_img, box):
        from PIL import Image

        from heuristique_style_transfer_code_tpu.data.augment import resized_crop_box

        top, left, ch, cw = box
        _, img, pil = golden_img
        ours = resized_crop_box(
            jnp.asarray(img), float(top), float(left), float(ch), float(cw)
        )
        gold = pil.crop((left, top, left + cw, top + ch)).resize(
            (64, 64), Image.BILINEAR
        )
        self._assert_close(ours, gold, atol=0.01)


class TestTraining:
    def test_loss_decreases_and_learns(self, tiny_imagefolder):
        """End-to-end slice: tiny truncated model learns the synthetic classes."""
        from heuristique_style_transfer_code_tpu.config.schema import TruncatedResNetConfig
        from heuristique_style_transfer_code_tpu.train.factories import make_truncated_resnet50
        from heuristique_style_transfer_code_tpu.train.train_loop import evaluate

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        cfg = TruncatedResNetConfig(batch_size=8, lr=0.01, truncate_layer=5, dim=32)
        combos = [(None, None)]
        variables, opt_state, train_step, eval_step, _ = make_truncated_resnet50(
            jax.random.PRNGKey(0), cfg, 4, combos
        )
        loader = HostLoader(idx.samples, 8, shuffle=True, seed=0)
        key = jax.random.PRNGKey(1)
        losses = []
        for epoch in range(4):
            for batch in loader:
                key, sub = jax.random.split(key)
                variables, opt_state, loss = train_step(
                    variables, opt_state, batch["image"], batch["label"], batch["combo"], sub
                )
                losses.append(float(loss))
        # SGD is noisy on 24 samples: compare epoch means, not endpoints
        k = len(losses) // 4
        assert np.mean(losses[-k:]) < np.mean(losses[:k])
        res = evaluate(eval_step, variables, HostLoader(idx.samples, 8), 4)
        assert res["val_accuracy"] >= 0.5  # classes are mean-separable

    def test_validation_writer_scalars_carry_step(self, tiny_imagefolder):
        """The reference's validation add_scalar calls omit the step arg
        (functions_RESNET50_Truncate.py:117-121, SURVEY §2.5 do-not-reproduce
        list): ours must pass it, for all five reference tags."""
        from heuristique_style_transfer_code_tpu.config.schema import TruncatedResNetConfig
        from heuristique_style_transfer_code_tpu.train.factories import make_truncated_resnet50
        from heuristique_style_transfer_code_tpu.train.train_loop import evaluate

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        cfg = TruncatedResNetConfig(batch_size=8, lr=0.01, truncate_layer=5, dim=32)
        variables, _, _, eval_step, _ = make_truncated_resnet50(
            jax.random.PRNGKey(0), cfg, 4, [(None, None)]
        )

        calls = []

        class FakeWriter:
            def add_scalar(self, tag, value, *args, **kwargs):
                step = args[0] if args else kwargs.get("global_step")
                calls.append((tag, step))

        evaluate(
            eval_step, variables, HostLoader(idx.samples[:8], 8), 4,
            fold=2, writer=FakeWriter(), step=7,
        )
        tags = {t for t, _ in calls}
        assert tags == {
            f"Fold_2/Validation/{k}"
            for k in ("Loss", "Accuracy", "Precision", "Recall", "F1")
        }
        assert all(step == 7 for _, step in calls)

    def test_kfold_artifacts(self, tiny_imagefolder, tmp_path):
        from heuristique_style_transfer_code_tpu.config.schema import TruncatedResNetConfig
        from heuristique_style_transfer_code_tpu.train.factories import make_truncated_resnet50
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        cfg = TruncatedResNetConfig(batch_size=8, lr=0.01, truncate_layer=4, dim=16, seed=0)
        save_dir = str(tmp_path / "out")
        combos = [(None, None)]

        def init_fn(key, fold):
            v, o, ts, es, _ = make_truncated_resnet50(key, cfg, 4, combos)
            return v, o, ts, es

        info = run_kfold(
            idx,
            k_folds=2,
            seed=0,
            epochs=1,
            batch_size=8,
            save_dir=save_dir,
            hyperparameters=cfg.to_dict(),
            init_fn=init_fn,
            verbose_batches=False,
        )
        assert len(info["fold_results"]) == 2
        assert "average_results" in info
        for fname in (
            "training_info.json",
            "best_model_results.json",
            "fold_0_performance.json",
            "fold_1_performance.json",
            "best_global_model.npz",
            "best_global_model_hyperparameters.json",
        ):
            assert os.path.exists(os.path.join(save_dir, fname)), fname
        with open(os.path.join(save_dir, "training_info.json")) as f:
            ti = json.load(f)
        assert ti["num_classes"] == 4 and ti["class_names"] == ["fog", "rain", "snow", "sun"]


class TestCheckpointIO:
    def test_npz_roundtrip(self, tmp_path):
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
            save_pytree_npz,
        )

        tree = {
            "a": {"kernel": np.ones((2, 3)), "bias": np.zeros(3)},
            "blocks": [{"w": np.full((2,), 7.0), "norm": None}, {"w": np.ones(1), "norm": None}],
        }
        p = str(tmp_path / "ckpt.npz")
        save_pytree_npz(tree, p)
        back = load_pytree_npz(p, as_jax=False)
        assert back["blocks"][0]["norm"] is None
        np.testing.assert_array_equal(back["a"]["kernel"], tree["a"]["kernel"])
        np.testing.assert_array_equal(back["blocks"][0]["w"], tree["blocks"][0]["w"])


class TestEpochResume:
    @pytest.mark.parametrize("interrupt", [(0, 1), (1, 1)])
    def test_interrupt_and_resume_bit_identical(self, tmp_path, interrupt):
        """Kill a k-fold run mid-fold (after an epoch checkpoint), resume it,
        and require the final model + training_info to be BIT-identical to an
        uninterrupted run. This pins the whole resume chain: PRNG key
        evolution, loader epoch seeking, optimiser-state round trip."""
        import json

        import pytest

        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_eval_step,
            make_train_step,
        )
        from PIL import Image

        rng = np.random.RandomState(0)
        root = tmp_path / "data" / "train"
        for ci, cls in enumerate(["a", "b"]):
            d = root / cls
            d.mkdir(parents=True)
            for i in range(6):
                Image.fromarray(
                    rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
                ).save(str(d / f"{i}.png"))
        dataset = ImageFolderIndex(str(root))

        def tiny_forward(v, images):
            flat = images.reshape(images.shape[0], -1)
            logits = flat @ v["w"] + v["b"]
            return logits, v

        def init_fn(key, fold):
            k1, k2 = jax.random.split(key)
            dim = 32 * 32 * 3
            variables = {
                "w": jax.random.normal(k1, (dim, 2), jnp.float32) * 0.01,
                "b": jnp.zeros((2,), jnp.float32),
            }
            opt = sgd_momentum(0.05, variables)

            from heuristique_style_transfer_code_tpu.data.augment import (
                make_augment_fn,
            )

            augment = make_augment_fn([(None, None)], crop=32)
            train_step = make_train_step(tiny_forward, opt, augment)
            eval_step = make_eval_step(lambda v, x: tiny_forward(v, x)[0], crop=32)
            return variables, opt.init(variables), train_step, eval_step

        common = dict(
            k_folds=2, seed=7, epochs=3, batch_size=4,
            hyperparameters={"lr": 0.05}, init_fn=init_fn,
            verbose_batches=False, num_workers=2,
        )

        straight_dir = str(tmp_path / "straight")
        # resume=True also on the uninterrupted run: per-epoch checkpoints
        # must be behaviour-neutral
        info_a = run_kfold(dataset, save_dir=straight_dir, resume=True, **common)

        resumed_dir = str(tmp_path / "resumed")
        with pytest.raises(RuntimeError, match="test seam"):
            run_kfold(
                dataset, save_dir=resumed_dir, resume=True,
                _interrupt_after=interrupt, **common,
            )
        assert os.path.exists(os.path.join(resumed_dir, "_inprogress_state.npz"))
        info_b = run_kfold(dataset, save_dir=resumed_dir, resume=True, **common)

        assert info_a["fold_results"] == info_b["fold_results"]
        a = load_pytree_npz(os.path.join(straight_dir, "best_global_model.npz"))
        b = load_pytree_npz(os.path.join(resumed_dir, "best_global_model.npz"))
        for ka in a:
            np.testing.assert_array_equal(np.asarray(a[ka]), np.asarray(b[ka]))
        # the cross-run improving-only file must also match exactly
        with open(os.path.join(straight_dir, "best_model_results.json")) as f:
            bm_a = json.load(f)
        with open(os.path.join(resumed_dir, "best_model_results.json")) as f:
            bm_b = json.load(f)
        strip = lambda lst: [  # noqa: E731
            {k: v for k, v in m.items() if k != "model_path"} for m in lst
        ]
        assert strip(bm_a) == strip(bm_b)
        # in-progress files cleaned up after success
        assert not os.path.exists(os.path.join(resumed_dir, "_inprogress_meta.json"))
        assert not os.path.exists(os.path.join(resumed_dir, "_inprogress_state.npz"))

    def test_resume_rejects_changed_configuration(self, tmp_path):
        """Resuming under a different seed/k_folds/etc. must refuse loudly
        instead of stitching old state into new splits."""
        import pytest

        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold
        from PIL import Image

        rng = np.random.RandomState(1)
        root = tmp_path / "data" / "train"
        for cls in ("a", "b"):
            d = root / cls
            d.mkdir(parents=True)
            for i in range(4):
                Image.fromarray(
                    rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
                ).save(str(d / f"{i}.png"))
        dataset = ImageFolderIndex(str(root))

        def tiny_forward(v, images):
            return images.reshape(images.shape[0], -1) @ v["w"], v

        def init_fn(key, fold):
            from heuristique_style_transfer_code_tpu.data.augment import (
                make_augment_fn,
            )
            from heuristique_style_transfer_code_tpu.train.optim import (
                sgd_momentum,
            )
            from heuristique_style_transfer_code_tpu.train.train_loop import (
                make_eval_step,
                make_train_step,
            )

            variables = {
                "w": jax.random.normal(key, (32 * 32 * 3, 2), jnp.float32) * 0.01
            }
            opt = sgd_momentum(0.05, variables)
            augment = make_augment_fn([(None, None)], crop=32)
            return (
                variables,
                opt.init(variables),
                make_train_step(tiny_forward, opt, augment),
                make_eval_step(lambda v, x: tiny_forward(v, x)[0], crop=32),
            )

        common = dict(
            k_folds=2, epochs=2, batch_size=4, hyperparameters={"lr": 0.05},
            init_fn=init_fn, verbose_batches=False, num_workers=2,
            save_dir=str(tmp_path / "m"), resume=True,
        )
        with pytest.raises(RuntimeError, match="test seam"):
            run_kfold(dataset, seed=7, _interrupt_after=(0, 0), **common)
        with pytest.raises(ValueError, match="does not match"):
            run_kfold(dataset, seed=8, **common)  # changed seed
        # unchanged config resumes fine
        run_kfold(dataset, seed=7, **common)


class TestTrainingDynamicsParity:
    """VERDICT r1 #6: 2 SGD steps in torch (reference train-loop semantics,
    functions_RESNET50_Truncate.py:63-87) vs the JAX train step from the same
    converted init on the same fixed batches — loss trajectory, updated BN
    running stats, and updated weights must match."""

    def test_two_sgd_steps_match_torch(self):
        import sys

        import torch
        import torch.nn as nn

        sys.path.insert(0, "/root/reference")
        from Models.Models_RESNET50_TRUNCATE import Classifier, TruncatedMoCoV3

        from tests.torch_ref import randomized_resnet50

        from heuristique_style_transfer_code_tpu.checkpoint.pth_converter import (
            convert_moco_checkpoint,
            to_numpy_state_dict,
        )
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            combined_apply,
        )
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_train_step,
        )

        truncate, dim, lr = 6, 16, 0.05
        torch.manual_seed(20)
        moco = TruncatedMoCoV3(
            randomized_resnet50(seed=21), truncate_after_layer=truncate,
            dim=dim, device="cpu",
        )
        clf = Classifier(input_dim=dim, num_classes=4)
        tree = convert_moco_checkpoint({
            "moco_model_state_dict": to_numpy_state_dict(moco.state_dict()),
            "classifier_state_dict": to_numpy_state_dict(clf.state_dict()),
        })
        # the converted tree holds views into the torch tensors; torch's
        # in-place SGD updates would otherwise mutate the JAX init under us
        tree = jax.tree_util.tree_map(np.copy, tree)

        rng = np.random.RandomState(22)
        batches = [rng.randn(8, 3, 96, 96).astype(np.float32) for _ in range(2)]
        labels = [rng.randint(0, 4, size=8).astype(np.int64) for _ in range(2)]

        # --- torch: reference train_model semantics (train mode, SGD m=0.9,
        # CE mean loss, BN running-stat updates)
        import itertools

        moco.train()
        clf.train()
        criterion = nn.CrossEntropyLoss()
        optimizer = torch.optim.SGD(
            [p for p in itertools.chain(moco.parameters(), clf.parameters())
             if p.requires_grad],
            lr=lr, momentum=0.9,
        )
        torch_losses = []
        for x, y in zip(batches, labels):
            optimizer.zero_grad()
            out = clf(moco(torch.from_numpy(x)))
            loss = criterion(out, torch.from_numpy(y))
            loss.backward()
            optimizer.step()
            torch_losses.append(float(loss))

        # --- JAX: the actual engine train step (identity augmentation so both
        # sides consume the identical float batch)
        def forward_train(v, images):
            logits, new_v = combined_apply(
                v["moco"], v["classifier"], images, truncate, train=True
            )
            return logits, {"moco": new_v, "classifier": v["classifier"]}

        optimizer_j = sgd_momentum(lr, tree)
        step = make_train_step(
            forward_train, optimizer_j, lambda img, c, k: img
        )
        variables = jax.tree_util.tree_map(jnp.asarray, tree)
        opt_state = optimizer_j.init(variables)
        jax_losses = []
        key = jax.random.PRNGKey(0)
        combos = jnp.zeros(8, dtype=jnp.int32)
        for x, y in zip(batches, labels):
            variables, opt_state, loss = step(
                variables, opt_state, _jx_nchw(x), jnp.asarray(y.astype(np.int32)),
                combos, key,
            )
            jax_losses.append(float(loss))

        np.testing.assert_allclose(jax_losses, torch_losses, rtol=1e-4, atol=1e-5)

        # updated BN running stats (first BN + a deep block BN)
        torch_sd = to_numpy_state_dict(moco.state_dict())
        got_bn1 = variables["moco"]["encoder"]["bn1"]
        np.testing.assert_allclose(
            np.asarray(got_bn1["mean"]), torch_sd["truncated_encoder.1.running_mean"],
            rtol=1e-3, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(got_bn1["var"]), torch_sd["truncated_encoder.1.running_var"],
            rtol=1e-3, atol=1e-5,
        )
        deep = variables["moco"]["encoder"]["layer2"][1]["bn3"]
        np.testing.assert_allclose(
            np.asarray(deep["mean"]),
            torch_sd["truncated_encoder.5.1.bn3.running_mean"],
            rtol=1e-3, atol=1e-5,
        )

        # updated weights: momentum + masked-SGD semantics
        np.testing.assert_allclose(
            np.asarray(variables["moco"]["fc"]["kernel"]),
            np.transpose(torch_sd["fc.weight"]), rtol=2e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(variables["classifier"]["fc"]["kernel"]),
            np.transpose(to_numpy_state_dict(clf.state_dict())["fc.weight"]),
            rtol=2e-3, atol=1e-4,
        )
        # conv1's weight grad is ill-conditioned in f32 (BN backward cancels
        # the dominant components; torch's own f32 run differs from its f64
        # run by 4.5% rel-Frobenius on this same 2-step update), so compare
        # the update by relative norm with a noise-class bound — a semantic
        # error (wrong momentum/BN/masking) would be O(1) here
        got_conv1 = np.asarray(variables["moco"]["encoder"]["conv1"]["kernel"])
        want_conv1 = np.transpose(
            torch_sd["truncated_encoder.0.weight"], (2, 3, 1, 0)
        )
        init_conv1 = np.asarray(tree["moco"]["encoder"]["conv1"]["kernel"])
        want_delta = want_conv1 - init_conv1
        assert np.linalg.norm(want_delta) > 0  # torch did update it
        rel = np.linalg.norm(got_conv1 - want_conv1) / np.linalg.norm(want_delta)
        assert rel < 0.25, rel


def _jx_nchw(x):
    return jnp.asarray(x.transpose(0, 2, 3, 1))


class TestMultiStepDispatch:
    def test_multi_step_matches_single_steps(self):
        """steps_per_dispatch: the scanned K-step dispatch must reproduce K
        single dispatches exactly (same RNG stream, losses, weights)."""
        from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_train_step,
            make_train_step_multi,
        )

        truncate = 4
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        host_vars = jax.tree_util.tree_map(
            np.asarray,
            {
                "moco": truncated_moco_init(k1, truncate, dim=16),
                "classifier": classifier_init(k2, 16, 4),
            },
        )

        def forward_train(v, images):
            logits, new_v = combined_apply(
                v["moco"], v["classifier"], images, truncate, train=True
            )
            return logits, {"moco": new_v, "classifier": v["classifier"]}

        optimizer = sgd_momentum(0.01, host_vars)
        augment = make_augment_fn([(None, None), ("horizontal_flip", None)], crop=64)

        rng = np.random.RandomState(0)
        images = rng.randint(0, 256, (4, 8, 96, 96, 3), dtype=np.uint8)
        labels = (rng.randint(0, 4, (4, 8))).astype(np.int32)
        combos = (np.arange(4 * 8).reshape(4, 8) % 2).astype(np.int32)
        key0 = jax.random.PRNGKey(42)

        # single dispatches (the host loop's key chain)
        step1 = make_train_step(forward_train, optimizer, augment)
        v = jax.tree_util.tree_map(jnp.asarray, host_vars)
        o = optimizer.init(v)
        key = key0
        losses1 = []
        subs = []
        for i in range(4):
            key, sub = jax.random.split(key)
            subs.append(sub)
            v, o, loss = step1(v, o, images[i], labels[i], combos[i], sub)
            losses1.append(float(loss))

        # two dispatches of K=2 with the same per-batch keys
        multi = make_train_step_multi(forward_train, optimizer, augment)
        vm = jax.tree_util.tree_map(jnp.asarray, host_vars)
        om = optimizer.init(vm)
        losses2 = []
        for c in range(2):
            ks = jnp.stack(subs[2 * c : 2 * c + 2])
            vm, om, ls = multi(
                vm, om, images[2 * c : 2 * c + 2], labels[2 * c : 2 * c + 2],
                combos[2 * c : 2 * c + 2], ks,
            )
            losses2.extend(np.asarray(ls).tolist())

        np.testing.assert_allclose(losses2, losses1, rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(vm["classifier"]["fc"]["kernel"]),
            np.asarray(v["classifier"]["fc"]["kernel"]),
            rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(vm["moco"]["encoder"]["bn1"]["mean"]),
            np.asarray(v["moco"]["encoder"]["bn1"]["mean"]),
            rtol=1e-5, atol=1e-7,
        )

    def test_train_cli_steps_per_dispatch_same_results(
        self, tiny_imagefolder, tmp_path
    ):
        """End to end: --steps_per_dispatch 2 must reproduce the default
        run's fold results (same seed => same splits, RNG, losses)."""
        import json as _json

        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )

        cfg = tmp_path / "cfg.json"
        cfg.write_text(
            '{"batch_size": 8, "lr": 0.01, "truncate_layer": 4, "seed": 0, "dim": 16}'
        )
        infos = {}
        for name, extra in (("one", []), ("two", ["--steps_per_dispatch", "2"])):
            out = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", str(cfg),
                "--epochs", "1", "--k_folds", "2", "--save_dir", out,
                "--seed", "0",
            ] + extra)
            with open(os.path.join(out, "training_info.json")) as f:
                infos[name] = _json.load(f)["fold_results"]
        for a, b in zip(infos["one"], infos["two"]):
            for k in ("val_loss", "val_accuracy", "val_f1"):
                np.testing.assert_allclose(a[k], b[k], rtol=1e-5)


class TestKfoldResume:
    def test_best_model_results_resume_semantics(self, tiny_imagefolder, tmp_path):
        """Re-running k-fold in the same save_dir only overwrites per-fold
        best checkpoints that improved (reference train_best_RESNET50_Truncate
        resume files, functions_RESNET50_Truncate.py:149-155)."""
        from heuristique_style_transfer_code_tpu.config.schema import (
            TruncatedResNetConfig,
        )
        from heuristique_style_transfer_code_tpu.train.factories import (
            make_truncated_resnet50,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold

        idx = ImageFolderIndex(str(tiny_imagefolder / "train"))
        cfg = TruncatedResNetConfig(batch_size=8, lr=0.01, truncate_layer=4, dim=16, seed=0)
        save_dir = str(tmp_path / "out")

        def init_fn(key, fold):
            v, o, ts, es, _ = make_truncated_resnet50(key, cfg, 4, [(None, None)])
            return v, o, ts, es

        kwargs = dict(
            k_folds=2, seed=0, epochs=1, batch_size=8, save_dir=save_dir,
            hyperparameters=cfg.to_dict(), init_fn=init_fn, verbose_batches=False,
        )
        run_kfold(idx, **kwargs)
        with open(os.path.join(save_dir, "best_model_results.json")) as f:
            results = json.load(f)
        by_fold = {r["fold"]: r for r in results}

        # doctor the file: fold 0 claims an unbeatable loss (must survive),
        # fold 1 claims a terrible one (must be overwritten)
        by_fold[0]["val_loss"] = 0.0
        by_fold[1]["val_loss"] = 1e9
        with open(os.path.join(save_dir, "best_model_results.json"), "w") as f:
            json.dump(list(by_fold.values()), f)
        mtime0 = os.path.getmtime(os.path.join(save_dir, "best_model_fold_0.npz"))

        run_kfold(idx, **kwargs)
        with open(os.path.join(save_dir, "best_model_results.json")) as f:
            after = {r["fold"]: r for r in json.load(f)}
        assert after[0]["val_loss"] == 0.0  # kept — not beaten
        assert after[1]["val_loss"] < 1e9  # overwritten — improved
        assert os.path.getmtime(
            os.path.join(save_dir, "best_model_fold_0.npz")
        ) == mtime0  # checkpoint untouched


class TestFreezeEncoder:
    def test_freeze_encoder_trains_only_classifier(self):
        """--freeze_encoder (reference train_best_RESNET50_Truncate.py:45,180:
        requires_grad=False on every moco param): after a train step the
        encoder weights are bit-identical, the classifier moved, and the BN
        running statistics still evolved (torch train() semantics)."""
        import jax
        import jax.numpy as jnp

        from heuristique_style_transfer_code_tpu.config.schema import (
            TruncatedResNetConfig,
        )
        from heuristique_style_transfer_code_tpu.train.factories import (
            setup_truncated_resnet50,
        )

        cfg = TruncatedResNetConfig(
            batch_size=8, lr=0.05, truncate_layer=4, dim=16, seed=0
        )
        setup = setup_truncated_resnet50(cfg, 4, [(None, None)],
                                         freeze_encoder=True)
        variables, opt_state = setup.init(jax.random.PRNGKey(0))
        before = jax.device_get(variables)
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.randint(0, 256, (8, 32, 32, 3), np.uint8))
        labels = jnp.asarray(rng.randint(0, 4, (8,), np.int64).astype(np.int32))
        combos = jnp.zeros(8, dtype=jnp.int32)
        variables, opt_state, loss = setup.train_step(
            variables, opt_state, images, labels, combos, jax.random.PRNGKey(1)
        )
        after = jax.device_get(variables)
        assert np.isfinite(float(loss))

        from heuristique_style_transfer_code_tpu.train.optim import (
            BN_STAT_KEYS,
            _leaf_name,
        )

        moved_cls, moved_stats, n_frozen = 0, 0, 0

        def walk(path, a, b):
            nonlocal moved_cls, moved_stats, n_frozen
            name = _leaf_name(path)
            top = str(getattr(path[0], "key", path[0]))
            if name in BN_STAT_KEYS:
                moved_stats += int(not np.array_equal(a, b))
            elif top == "moco":
                np.testing.assert_array_equal(a, b, err_msg=str(path))
                n_frozen += 1
            else:
                moved_cls += int(not np.array_equal(a, b))

        jax.tree_util.tree_map_with_path(
            lambda p, a, b: walk(p, a, b), before, after
        )
        assert n_frozen >= 3  # every encoder weight checked frozen (t=4 stem)
        assert moved_cls >= 1  # the classifier trained
        assert moved_stats >= 1  # BN stats still evolve while frozen
