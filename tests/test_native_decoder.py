"""Native C++ JPEG decoder: bit-parity with the PIL staging path.

The native path (heuristique_style_transfer_code_tpu/native/decoder.cpp)
must be BIT-IDENTICAL to data/loader.py::load_image_staged — same libjpeg
ISLOW decode settings as Pillow, and a reimplementation of Pillow's
Resample.c fixed-point BILINEAR. Any non-JPEG or unsupported input must fall
back to PIL silently.
"""
import io
import os

import numpy as np
import pytest
from PIL import Image

from heuristique_style_transfer_code_tpu.data.loader import (
    STAGING_SIZE,
    load_image_staged,
)
from heuristique_style_transfer_code_tpu.native import get_decoder, is_jpeg


@pytest.fixture(scope="module")
def decoder():
    old = os.environ.get("HST_NATIVE_DECODE")
    os.environ["HST_NATIVE_DECODE"] = "1"  # required: build failure = test failure
    try:
        yield get_decoder()
    finally:
        if old is None:
            os.environ.pop("HST_NATIVE_DECODE", None)
        else:
            os.environ["HST_NATIVE_DECODE"] = old


def _pil_staged(data: bytes, tmp_path, staging=STAGING_SIZE):
    path = str(tmp_path / "img.jpg")
    with open(path, "wb") as f:
        f.write(data)
    old = os.environ.get("HST_NATIVE_DECODE")
    os.environ["HST_NATIVE_DECODE"] = "0"
    try:
        return load_image_staged(path, staging)
    finally:
        if old is None:
            os.environ.pop("HST_NATIVE_DECODE", None)
        else:
            os.environ["HST_NATIVE_DECODE"] = old


def _jpeg_bytes(arr, **kw):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG", **kw)
    return buf.getvalue()


class TestBitParity:
    # landscape, portrait, square, off-by-one, heavy down- and up-scale
    SHAPES = [
        (640, 480, 90),
        (480, 640, 75),
        (333, 517, 85),
        (257, 256, 100),
        (256, 256, 90),
        (301, 300, 77),
        (100, 80, 92),
        (50, 40, 95),
        (1024, 768, 95),
    ]

    @pytest.mark.parametrize("w,h,q", SHAPES)
    def test_shapes(self, decoder, tmp_path, w, h, q):
        rng = np.random.RandomState(w * 7 + h)
        data = _jpeg_bytes(rng.randint(0, 256, (h, w, 3), dtype=np.uint8), quality=q)
        nat = decoder.decode_staged(data, STAGING_SIZE)
        assert nat is not None
        pil = _pil_staged(data, tmp_path)
        np.testing.assert_array_equal(nat, pil)
        assert nat.shape == (STAGING_SIZE, STAGING_SIZE, 3)

    @pytest.mark.parametrize(
        "kw,tag",
        [
            ({"quality": 90, "progressive": True}, "progressive"),
            ({"quality": 90, "subsampling": 0}, "444"),
            ({"quality": 90, "subsampling": 2}, "420"),
        ],
    )
    def test_encodings(self, decoder, tmp_path, kw, tag):
        rng = np.random.RandomState(3)
        data = _jpeg_bytes(rng.randint(0, 256, (480, 640, 3), dtype=np.uint8), **kw)
        nat = decoder.decode_staged(data)
        pil = _pil_staged(data, tmp_path)
        np.testing.assert_array_equal(nat, pil)

    def test_grayscale(self, decoder, tmp_path):
        rng = np.random.RandomState(4)
        buf = io.BytesIO()
        Image.fromarray(rng.randint(0, 256, (480, 640), dtype=np.uint8), mode="L").save(
            buf, format="JPEG", quality=90
        )
        data = buf.getvalue()
        nat = decoder.decode_staged(data)
        pil = _pil_staged(data, tmp_path)
        np.testing.assert_array_equal(nat, pil)

    def test_natural_gradient_image(self, decoder, tmp_path):
        # smooth content (unlike noise) exercises upsampling interpolation
        y, x = np.mgrid[0:480, 0:640]
        arr = np.stack(
            [(x * 255 // 640), (y * 255 // 480), ((x + y) * 255 // 1120)], -1
        ).astype(np.uint8)
        data = _jpeg_bytes(arr, quality=85)
        np.testing.assert_array_equal(
            decoder.decode_staged(data), _pil_staged(data, tmp_path)
        )

    def test_alternate_staging_size(self, decoder, tmp_path):
        rng = np.random.RandomState(5)
        data = _jpeg_bytes(rng.randint(0, 256, (300, 500, 3), dtype=np.uint8))
        nat = decoder.decode_staged(data, 128)
        pil = _pil_staged(data, tmp_path, staging=128)
        np.testing.assert_array_equal(nat, pil)
        assert nat.shape == (128, 128, 3)


class TestFastMode:
    def test_fast_close_to_exact_and_cheaper_dims(self, decoder):
        # smooth large photo: fast (DCT-scaled) decode must stay visually
        # equivalent to the exact path; the contract is approximate
        y, x = np.mgrid[0:1500, 0:2000]
        arr = np.stack(
            [(x * 255 // 2000), (y * 255 // 1500), ((x + y) % 256)], -1
        ).astype(np.uint8)
        data = _jpeg_bytes(arr, quality=90)
        exact = decoder.decode_staged(data, 256)
        fast = decoder.decode_staged(data, 256, fast=True)
        assert fast.shape == exact.shape == (256, 256, 3)
        d = np.abs(exact.astype(int) - fast.astype(int))
        assert d.mean() < 3.0
        assert np.percentile(d, 99) <= 25

    def test_fast_on_small_image_is_exact(self, decoder, tmp_path):
        # no DCT scale fits (shorter side already ~staging): denom stays 1
        rng = np.random.RandomState(8)
        data = _jpeg_bytes(rng.randint(0, 256, (300, 400, 3), dtype=np.uint8))
        fast = decoder.decode_staged(data, 256, fast=True)
        pil = _pil_staged(data, tmp_path)
        np.testing.assert_array_equal(fast, pil)

    def test_loader_fast_env(self, decoder, tmp_path):
        rng = np.random.RandomState(9)
        p = str(tmp_path / "big.jpg")
        Image.fromarray(
            rng.randint(0, 256, (1200, 1600, 3), dtype=np.uint8)
        ).save(p, quality=90)
        os.environ["HST_NATIVE_DECODE"] = "1"
        os.environ["HST_NATIVE_DECODE_FAST"] = "1"
        try:
            out = load_image_staged(p)
        finally:
            os.environ.pop("HST_NATIVE_DECODE_FAST", None)
            os.environ.pop("HST_NATIVE_DECODE", None)
        assert out.shape == (STAGING_SIZE, STAGING_SIZE, 3)


class TestFallbacks:
    def test_cmyk_falls_back_to_none(self, decoder):
        buf = io.BytesIO()
        Image.new("CMYK", (300, 300), (10, 20, 30, 40)).save(buf, format="JPEG")
        assert decoder.decode_staged(buf.getvalue()) is None

    def test_corrupt_data(self, decoder):
        assert decoder.decode_staged(b"\xff\xd8\xff\xe0 garbage") is None

    def test_truncated_jpeg_falls_back(self, decoder):
        """A valid header + partial scan data decodes 'successfully' in
        libjpeg (gray fill) — the native path must reject it (warning count)
        so PIL gets to apply its own truncation policy."""
        rng = np.random.RandomState(10)
        data = _jpeg_bytes(rng.randint(0, 256, (480, 640, 3), dtype=np.uint8))
        truncated = data[: len(data) // 2]
        assert decoder.decode_staged(truncated) is None

    def test_is_jpeg_sniff(self):
        assert is_jpeg(b"\xff\xd8\xff\xe0abc")
        assert not is_jpeg(b"\x89PNG\r\n")
        assert not is_jpeg(b"")

    def test_loader_uses_native_and_matches_png_path(self, decoder, tmp_path):
        """load_image_staged must give identical results whether the file is
        the JPEG (native path) or PIL decodes it — and PNGs keep working."""
        rng = np.random.RandomState(6)
        arr = rng.randint(0, 256, (300, 400, 3), dtype=np.uint8)
        jpg = str(tmp_path / "a.jpg")
        Image.fromarray(arr).save(jpg, quality=95)
        png = str(tmp_path / "a.png")
        Image.fromarray(arr).save(png)
        os.environ["HST_NATIVE_DECODE"] = "1"
        try:
            out_native = load_image_staged(jpg)
        finally:
            os.environ["HST_NATIVE_DECODE"] = "0"
        out_pil = load_image_staged(jpg)
        np.testing.assert_array_equal(out_native, out_pil)
        out_png = load_image_staged(png)  # PIL path, no native eligibility
        assert out_png.shape == (STAGING_SIZE, STAGING_SIZE, 3)

    def test_disabled_by_env(self, tmp_path):
        os.environ["HST_NATIVE_DECODE"] = "0"
        try:
            from heuristique_style_transfer_code_tpu import native

            assert native.get_decoder() is None
        finally:
            os.environ.pop("HST_NATIVE_DECODE", None)


class TestHostLoaderIntegration:
    def test_hostloader_batches_identical(self, decoder, tmp_path):
        from heuristique_style_transfer_code_tpu.data.loader import HostLoader

        rng = np.random.RandomState(7)
        samples = []
        for i in range(6):
            p = str(tmp_path / f"s{i}.jpg")
            Image.fromarray(
                rng.randint(0, 256, (260 + i, 320, 3), dtype=np.uint8)
            ).save(p, quality=90)
            samples.append((p, i % 3))

        def run():
            loader = HostLoader(samples, batch_size=4, num_workers=4)
            return [b["image"].copy() for b in loader]

        os.environ["HST_NATIVE_DECODE"] = "1"
        try:
            native_batches = run()
        finally:
            os.environ["HST_NATIVE_DECODE"] = "0"
        pil_batches = run()
        os.environ.pop("HST_NATIVE_DECODE", None)
        assert len(native_batches) == len(pil_batches)
        for a, b in zip(native_batches, pil_batches):
            np.testing.assert_array_equal(a, b)
