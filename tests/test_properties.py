"""Property-based tests (hypothesis) for the invariants golden tests can't
sweep: arbitrary sizes through the shared geometry, the resize operator's
algebraic properties, and Gram kernel identities."""
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
        # aspect ratio preserved to rounding
        if h <= w:
            assert abs(tw - w * shorter / h) <= 0.5 + 1e-9 or tw == 1
        else:
            assert abs(th - h * shorter / w) <= 0.5 + 1e-9 or th == 1

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
