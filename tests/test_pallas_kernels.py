"""Pallas kernel correctness vs the XLA einsum path (interpret mode on CPU;
the same kernels compile on TPU)."""
import numpy as np
import jax.numpy as jnp
import pytest

from heuristique_style_transfer_code_tpu.ops.gram import gram_matrix_nhwc, pooled_gram_nhwc
from heuristique_style_transfer_code_tpu.ops.pallas.gram_kernel import (
    PALLAS_AVAILABLE,
    gram_pallas,
    pooled_gram_pallas,
)

pytestmark = pytest.mark.skipif(not PALLAS_AVAILABLE, reason="pallas unavailable")


@pytest.mark.parametrize("shape", [(2, 7, 7, 64), (1, 8, 8, 128)])
def test_gram_kernel_matches_einsum(shape):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = np.asarray(gram_matrix_nhwc(x))
    got = np.asarray(gram_pallas(x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,s", [((2, 7, 7, 256), 7), ((1, 14, 14, 64), 4)])
def test_pooled_gram_kernel_matches_einsum(shape, s):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(*shape).astype(np.float32))
    want = np.asarray(pooled_gram_nhwc(x, s))
    got = np.asarray(pooled_gram_pallas(x, s, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_backend_selection_via_argument():
    """HST_GRAM_BACKEND / backend= routes pooled_gram through the Pallas path."""
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 7, 7, 64).astype(np.float32))
    want = np.asarray(pooled_gram_nhwc(x, 7, backend="xla"))
    # interpret-mode pallas on CPU via the kernel directly; the backend arg
    # dispatches to the same function
    from heuristique_style_transfer_code_tpu.ops import gram as gram_mod

    got = np.asarray(gram_mod.pooled_gram_nhwc(x, 7, backend="pallas"))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
