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


class TestInstanceNormKernel:
    """Fused IN kernel (ops/pallas/instance_norm_kernel.py) vs the XLA
    composition in nn/transformer_net._in_apply — the net forward's named
    bound (PERF.md r4)."""

    def _ref(self, x, scale, bias, eps=1e-5, relu=False):
        import jax

        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
        var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + eps)
        y = y * scale[:, None, None, :] + bias[:, None, None, :]
        if relu:
            y = jnp.maximum(y, 0.0)
        return y.astype(x.dtype)

    @pytest.mark.parametrize("shape,relu", [
        ((3, 8, 8, 32), False),
        ((2, 8, 12, 64), True),
        ((1, 16, 12, 128), False),
    ])
    def test_matches_xla_composition(self, shape, relu):
        from heuristique_style_transfer_code_tpu.ops.pallas.instance_norm_kernel import (
            instance_norm_pallas,
        )

        rng = np.random.RandomState(3)
        b, c = shape[0], shape[-1]
        x = jnp.asarray(rng.randn(*shape).astype(np.float32) * 2 + 0.5)
        scale = jnp.asarray(rng.randn(b, c).astype(np.float32))
        bias = jnp.asarray(rng.randn(b, c).astype(np.float32))
        want = np.asarray(self._ref(x, scale, bias, relu=relu))
        got = np.asarray(
            instance_norm_pallas(x, scale, bias, relu=relu, interpret=True)
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_bf16_matches_in_01_space(self):
        from heuristique_style_transfer_code_tpu.ops.pallas.instance_norm_kernel import (
            instance_norm_pallas,
        )

        rng = np.random.RandomState(4)
        x = jnp.asarray(
            rng.randn(2, 8, 8, 32).astype(np.float32), jnp.bfloat16
        )
        scale = jnp.asarray(rng.randn(2, 32).astype(np.float32))
        bias = jnp.asarray(rng.randn(2, 32).astype(np.float32))
        want = np.asarray(self._ref(x, scale, bias), np.float32)
        got = np.asarray(
            instance_norm_pallas(x, scale, bias, interpret=True), np.float32
        )
        assert np.abs(got - want).max() < 0.05

    def test_channel_constraint_rejected(self):
        from heuristique_style_transfer_code_tpu.ops.pallas.instance_norm_kernel import (
            instance_norm_pallas,
        )

        x = jnp.zeros((1, 8, 8, 48), jnp.float32)
        with pytest.raises(ValueError, match="dividing 128"):
            instance_norm_pallas(x, jnp.ones((1, 48)), jnp.zeros((1, 48)),
                                 interpret=True)

    def test_prime_row_count_uses_pad_mask_path(self):
        """H*W*C/128 prime (no divisor near the chunk cap): the kernel pads
        the flat view and masks the tail out of the statistics instead of
        degenerating to one 128-lane row per fori_loop iteration."""
        from heuristique_style_transfer_code_tpu.ops.pallas import (
            instance_norm_kernel as ink,
        )

        rng = np.random.RandomState(5)
        # (1, 4, 149, 32): rows = 4*149*32/128 = 149 (prime, below the
        # chunk floor — stays on the unpadded path; sanity anchor)
        x = jnp.asarray(rng.randn(1, 4, 149, 32).astype(np.float32) + 0.3)
        # a genuinely divisor-poor case past the cap: rows = 4099 (prime,
        # > 4096) — the only divisor <= cap is 1
        x2 = jnp.asarray(
            rng.randn(1, 4, 4099, 32).astype(np.float32) * 1.5 - 0.2
        )
        rows2 = 4 * 4099 * 32 // 128
        assert ink._row_chunk(rows2) == 1  # would be pathological unpadded
        for xi in (x, x2):
            b, c = xi.shape[0], xi.shape[-1]
            scale = jnp.asarray(rng.randn(b, c).astype(np.float32))
            bias = jnp.asarray(rng.randn(b, c).astype(np.float32))
            want = np.asarray(self._ref(xi, scale, bias, relu=True))
            got = np.asarray(
                ink.instance_norm_pallas(xi, scale, bias, relu=True,
                                         interpret=True)
            )
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_vmem_budget_rejected_with_clear_error(self):
        """Whole-image residency past the VMEM budget raises a descriptive
        ValueError instead of an opaque Mosaic compile failure."""
        from heuristique_style_transfer_code_tpu.ops.pallas.instance_norm_kernel import (
            instance_norm_pallas,
        )

        x = jnp.zeros((1, 512, 512, 128), jnp.float32)  # ~134 MB image
        with pytest.raises(ValueError, match="VMEM budget"):
            instance_norm_pallas(x, jnp.ones((1, 128)), jnp.zeros((1, 128)),
                                 interpret=True)
