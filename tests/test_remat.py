"""Rematerialisation (--remat / jax.checkpoint): grads equal the plain
step, saved-residual footprint actually shrinks, and the CLI flag trains.

The remat unit is the bottleneck block (nn/resnet.py) / the strided
discriminator layer (nn/patch_discriminator.py); under autodiff only unit
boundaries stay resident and unit-internal activations are recomputed.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
    classifier_init,
    combined_apply,
    truncated_moco_init,
)
from heuristique_style_transfer_code_tpu.models.gram_attention import (
    gram_attention_apply,
    gram_attention_init,
)
from heuristique_style_transfer_code_tpu.models.multi_patchgan import (
    multiscale_apply,
    multiscale_init,
)
from heuristique_style_transfer_code_tpu.train.train_loop import masked_cross_entropy


def _resid_bytes(f, *args):
    """Total bytes of residuals autodiff would keep resident for f."""
    # public in jax.ad_checkpoint on newer JAX; only print_saved_residuals
    # is re-exported on 0.9.0
    from jax._src.ad_checkpoint import saved_residuals

    return sum(int(np.prod(aval.shape)) * aval.dtype.itemsize
               for aval, _ in saved_residuals(f, *args))


class TestRematFlagship:
    @pytest.fixture(scope="class")
    def setup(self):
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        variables = {
            "moco": truncated_moco_init(k1, truncate_layer=6, dim=32),
            "classifier": classifier_init(k2, 32, 4),
        }
        x = jax.random.uniform(jax.random.PRNGKey(1), (4, 64, 64, 3))
        labels = jnp.array([0, 1, 2, 3])
        return variables, x, labels

    def _loss(self, remat):
        def loss_fn(v, x, labels):
            logits, _ = combined_apply(v["moco"], v["classifier"], x, 6,
                                       train=True, remat=remat)
            return masked_cross_entropy(logits, labels)

        return loss_fn

    def test_grads_match_plain_step(self, setup):
        variables, x, labels = setup
        g_plain = jax.jit(jax.grad(self._loss(False)))(variables, x, labels)
        g_remat = jax.jit(jax.grad(self._loss(True)))(variables, x, labels)
        for p, a, b in zip(
            jax.tree_util.tree_leaves_with_path(g_plain)[0:],
            jax.tree_util.tree_leaves(g_plain),
            jax.tree_util.tree_leaves(g_remat),
        ):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7, err_msg=str(p[0]))

    def test_residual_bytes_drop(self, setup):
        variables, x, labels = setup
        plain = _resid_bytes(self._loss(False), variables, x, labels)
        remat = _resid_bytes(self._loss(True), variables, x, labels)
        # block-internal activations dominate: expect a substantial cut
        assert remat < 0.7 * plain, (plain, remat)

    def test_train_variables_identical(self, setup):
        """The updated BN stats (aux output) also survive remat unchanged."""
        variables, x, labels = setup
        outs = {}
        for remat in (False, True):
            logits, new_v = combined_apply(variables["moco"], variables["classifier"],
                                           x, 6, train=True, remat=remat)
            outs[remat] = (logits, new_v)
        np.testing.assert_array_equal(outs[False][0], outs[True][0])
        for a, b in zip(jax.tree_util.tree_leaves(outs[False][1]),
                        jax.tree_util.tree_leaves(outs[True][1])):
            np.testing.assert_array_equal(a, b)


class TestRematOtherFamilies:
    def test_gram_attention_grads(self):
        v = gram_attention_init(jax.random.PRNGKey(0), 6, 4, 4)
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        labels = jnp.array([0, 1])

        def loss_fn(v, remat):
            _, logits, _ = gram_attention_apply(v, x, 6, 4, 4, train=True,
                                                remat=remat)
            return masked_cross_entropy(logits, labels)

        g0 = jax.jit(lambda v: jax.grad(loss_fn)(v, False))(v)
        g1 = jax.jit(lambda v: jax.grad(loss_fn)(v, True))(v)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_multi_patchgan_grads_and_residuals(self):
        v = multiscale_init(jax.random.PRNGKey(0),
                            {"small": 10, "medium": 70, "large": 150},
                            num_classes=4, norm="batch")
        x = jax.random.uniform(jax.random.PRNGKey(1), (2, 64, 64, 3))
        labels = jnp.array([0, 1])

        def loss_fn(v, remat):
            logits, _ = multiscale_apply(v, x, norm="batch", train=True,
                                         remat=remat)
            return masked_cross_entropy(logits, labels)

        g0 = jax.jit(lambda v: jax.grad(loss_fn)(v, False))(v)
        g1 = jax.jit(lambda v: jax.grad(loss_fn)(v, True))(v)
        for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
        plain = _resid_bytes(lambda v: loss_fn(v, False), v)
        remat = _resid_bytes(lambda v: loss_fn(v, True), v)
        assert remat < plain, (plain, remat)
