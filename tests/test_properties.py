"""Property-based tests (hypothesis) for the invariants golden tests can't
sweep: arbitrary sizes through the shared geometry, the resize operator's
algebraic properties, and Gram kernel identities."""
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings, strategies as st

from heuristique_style_transfer_code_tpu.core.geometry import (
    center_crop_offsets,
    resize_target,
    staging_geometry,
)

SIZES = st.integers(min_value=1, max_value=4096)


class TestGeometry:
    @given(h=SIZES, w=SIZES, shorter=st.integers(8, 512))
    @settings(max_examples=200, deadline=None)
    def test_resize_target_invariants(self, h, w, shorter):
        th, tw = resize_target(h, w, shorter)
        assert min(th, tw) == shorter or max(th, tw) == shorter  # one side pinned
        if h <= w:
            assert th == shorter and tw >= 1
        else:
            assert tw == shorter and th >= 1
        # aspect ratio preserved to torchvision's TRUNCATION of the long
        # side: 0 <= exact - target < 1 (int(size * long / short))
        if h <= w:
            assert 0 <= w * shorter / h - tw < 1 + 1e-9 or tw == 1
        else:
            assert 0 <= h * shorter / w - th < 1 + 1e-9 or th == 1

    @given(h=SIZES, w=SIZES, size=st.integers(1, 512))
    @settings(max_examples=200, deadline=None)
    def test_center_crop_offsets_in_bounds(self, h, w, size):
        top, left = center_crop_offsets(h, w, size)
        assert top >= 0 and left >= 0
        if h >= size:
            assert top + size <= h
        if w >= size:
            assert left + size <= w

    @given(w=SIZES, h=SIZES, staging=st.integers(8, 512))
    @settings(max_examples=200, deadline=None)
    def test_staging_geometry_crop_always_fits(self, w, h, staging):
        tw, th, left, top = staging_geometry(w, h, staging)
        assert min(th, tw) == staging  # shorter side lands exactly on staging
        assert 0 <= left <= tw - staging
        assert 0 <= top <= th - staging

class TestResizeOperator:
    @given(
        in_size=st.integers(2, 300),
        out_size=st.integers(1, 260),
    )
    @settings(max_examples=100, deadline=None)
    def test_resize_matrix_row_stochastic(self, in_size, out_size):
        from heuristique_style_transfer_code_tpu.ops.resize import (
            _resize_matrix_np,
        )

        M = _resize_matrix_np(in_size, out_size)
        assert M.shape == (out_size, in_size)
        np.testing.assert_allclose(M.sum(axis=1), 1.0, atol=1e-5)
        assert (M >= 0).all()
        # constant images stay constant under any resize
        c = M @ np.full((in_size,), 7.0, np.float32)
        np.testing.assert_allclose(c, 7.0, atol=1e-4)


class TestGram:
    @given(
        c=st.integers(1, 16),
        h=st.integers(1, 12),
        w=st.integers(1, 12),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=50, deadline=None)
    def test_gram_psd_and_matches_naive(self, c, h, w, seed):
        import jax.numpy as jnp

        from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc

        rng = np.random.RandomState(seed)
        f = rng.randn(1, h, w, c).astype(np.float32)
        g = np.asarray(gram_matrix_nhwc(jnp.asarray(f)))[0]
        flat = f[0].reshape(h * w, c)
        naive = (flat.T @ flat) / (h * w)
        np.testing.assert_allclose(g, naive, rtol=1e-4, atol=1e-5)
        eig = np.linalg.eigvalsh(g.astype(np.float64))
        assert eig.min() >= -1e-4  # PSD up to float noise


class TestHueProperties:
    """Algebraic properties of the float-HSV hue shift (data/augment.py)."""

    def _img(self, seed=0, n=1024):
        rng = np.random.RandomState(seed)
        return jnp.asarray(rng.rand(n, 1, 3).astype(np.float32))

    def test_zero_shift_is_identity(self):
        from heuristique_style_transfer_code_tpu.data.augment import adjust_hue

        img = self._img()
        np.testing.assert_allclose(
            np.asarray(adjust_hue(img, 0.0)), np.asarray(img), atol=2e-6
        )

    def test_full_turn_is_identity(self):
        from heuristique_style_transfer_code_tpu.data.augment import adjust_hue

        img = self._img(1)
        np.testing.assert_allclose(
            np.asarray(adjust_hue(img, 1.0)), np.asarray(img), atol=1e-5
        )

    def test_shift_roundtrip(self):
        from heuristique_style_transfer_code_tpu.data.augment import adjust_hue

        img = self._img(2)
        out = adjust_hue(adjust_hue(img, 0.07), -0.07)
        np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-5)

    def test_preserves_value_and_gray_pixels(self):
        """Hue rotation keeps V = max(r,g,b) invariant and leaves achromatic
        pixels untouched."""
        from heuristique_style_transfer_code_tpu.data.augment import adjust_hue

        img = self._img(3)
        out = adjust_hue(img, 0.23)
        np.testing.assert_allclose(
            np.asarray(out.max(axis=-1)), np.asarray(img.max(axis=-1)), atol=2e-6
        )
        gray = jnp.broadcast_to(
            jnp.linspace(0.0, 1.0, 16)[:, None, None], (16, 1, 3)
        )
        np.testing.assert_allclose(
            np.asarray(adjust_hue(gray, 0.4)), np.asarray(gray), atol=2e-6
        )
