"""Pipeline-parallel (GPipe) tests on the 8-virtual-device CPU backend.

parallel/pipeline.py completes the parallelism axis set (dp/tp/sp from
round 2, now pp) for the flagship classifier
(reference Models/Models_RESNET50_TRUNCATE.py:5-54 — the reference itself
has no distributed path at all, SURVEY.md §2.4).

Strategy: exact f64 equality against a sequential reference on a tiny
3-unit CNN plugged into the same schedule (the full flagship's f64 backward
starves XLA-CPU's 40 s collective-rendezvous budget on 1-core hosts), plus
flagship f32 eval parity. The driver dryrun additionally executes the
flagship pp train step each round (__graft_entry__.dryrun_multichip).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heuristique_style_transfer_code_tpu.parallel import pipeline as pp
from heuristique_style_transfer_code_tpu.ops.conv import conv2d, conv2d_init
from heuristique_style_transfer_code_tpu.ops.norm import batch_norm, batch_norm_init
from heuristique_style_transfer_code_tpu.ops.linear import linear, linear_init
from heuristique_style_transfer_code_tpu.ops.pooling import global_avg_pool
from heuristique_style_transfer_code_tpu.train.train_loop import _merge_bn_stats
from heuristique_style_transfer_code_tpu.train.optim import BN_STAT_KEYS, _leaf_name


# ---------------------------------------------------------------------------
# tiny 3-unit CNN plugged into the pipeline's PipelineUnits protocol


def _tiny_trees(v):
    return [
        {"c1": v["c1"], "b1": v["b1"]},
        {"c2": v["c2"], "b2": v["b2"]},
        {"fc": v["fc"]},
    ]


def _tiny_apply(i, p, x, train):
    if i < 2:
        c, b = ("c1", "b1") if i == 0 else ("c2", "b2")
        h = conv2d(p[c], x, stride=2, padding=1)
        if train:
            h, nb = batch_norm(p[b], h, train=True)
            return jax.nn.relu(h), {c: p[c], b: nb}
        return jax.nn.relu(batch_norm(p[b], h)), None
    y = linear(p["fc"], global_avg_pool(x))
    return y, ({"fc": p["fc"]} if train else None)


TINY = pp.PipelineUnits(
    num_units=3, trees=_tiny_trees, apply=_tiny_apply, rebuild=dict
)


def _tiny_variables(key, k=3, dtype=jnp.float32):
    ks = jax.random.split(key, 3)
    v = {
        "c1": conv2d_init(ks[0], 3, 8, 3),
        "b1": batch_norm_init(8),
        "c2": conv2d_init(ks[1], 8, 16, 3),
        "b2": batch_norm_init(16),
        "fc": linear_init(ks[2], 16, k),
    }
    return jax.tree_util.tree_map(lambda l: l.astype(dtype), v)


def _tiny_seq_forward(cur, x, train):
    """Sequential reference: the units applied in order, BN-stat chaining."""
    new = {}
    for i in range(3):
        x, ni = _tiny_apply(i, _tiny_trees(cur)[i], x, train)
        if train:
            new.update(ni)
    return x, new


class TestGroupBounds:
    def test_even_and_uneven_grouping(self):
        assert pp._group_bounds(4, 4) == ((0, 1), (1, 2), (2, 3), (3, 4))
        assert pp._group_bounds(4, 2) == ((0, 2), (2, 4))
        assert pp._group_bounds(4, 3) == ((0, 2), (2, 3), (3, 4))
        assert pp._group_bounds(3, 3) == ((0, 1), (1, 2), (2, 3))

    def test_rejects_more_stages_than_units(self):
        with pytest.raises(AssertionError):
            pp._group_bounds(3, 4)


class TestPipelineTinyExact:
    """f64 bit-level equality of the full GPipe schedule vs a sequential
    reference: forward (eval), loss, one SGD(momentum) train step including
    the chained-then-data-averaged BN running stats."""

    S, D, MB, M, IMG, K = 3, 2, 2, 3, 16, 3
    LR, MOM = 0.05, 0.9

    def _setup(self):
        variables = _tiny_variables(jax.random.PRNGKey(0), self.K, jnp.float64)
        rng = np.random.RandomState(1)
        B = self.MB * self.D
        images = jnp.asarray(rng.rand(self.M, B, self.IMG, self.IMG, 3), jnp.float64)
        labels_np = rng.randint(0, self.K, size=(self.M, B)).astype(np.int32)
        labels_np[0, 1] = -1  # exercise the pad mask
        mesh = pp.make_mesh_pipeline(self.S * self.D, pipe=self.S)
        spec = pp.make_pipeline_spec(
            variables, self.S, self.MB, self.IMG, dtype=jnp.float64, units=TINY
        )
        return variables, images, jnp.asarray(labels_np), mesh, spec

    def test_pack_unpack_roundtrip_exact(self):
        with jax.enable_x64():
            variables, _, _, _, spec = self._setup()
            rt = pp.unpack_pipeline_params(spec, pp.pack_pipeline_params(spec, variables))
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                variables, rt,
            )

    def test_mask_packing(self):
        with jax.enable_x64():
            variables, _, _, _, spec = self._setup()
            tmask, smask = pp.pack_pipeline_masks(spec, variables)
            assert tmask.shape == (self.S, spec.max_params)
            # stats are never trainable; padding is neither
            assert float(jnp.max(tmask * smask)) == 0.0
            n_leaf = sum(
                int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(variables)
            )
            assert float(jnp.sum(tmask) + jnp.sum(smask)) == n_leaf
            # frozen_fn freezes by path: freeze unit-0 conv
            t2, _ = pp.pack_pipeline_masks(
                spec, variables, frozen_fn=lambda path: path.startswith("c1")
            )
            n_c1 = sum(
                int(np.prod(l.shape))
                for l in jax.tree_util.tree_leaves(variables["c1"])
            )
            assert float(jnp.sum(tmask) - jnp.sum(t2)) == n_c1

    def test_eval_equals_sequential(self):
        with jax.enable_x64():
            variables, images, _, mesh, spec = self._setup()
            stacked = jax.device_put(
                pp.pack_pipeline_params(spec, variables), pp.pipeline_param_sharding(mesh)
            )
            imgs = jax.device_put(images, pp.pipeline_batch_sharding(mesh))
            got = np.asarray(pp.make_pipeline_eval_step(spec, mesh)(stacked, imgs))
            ref = np.stack([
                np.asarray(_tiny_seq_forward(variables, images[m], False)[0])
                for m in range(self.M)
            ])
            np.testing.assert_allclose(got, ref, rtol=0, atol=1e-14)

    def test_train_step_equals_sequential(self):
        with jax.enable_x64():
            variables, images, labels, mesh, spec = self._setup()
            sh = pp.pipeline_param_sharding(mesh)
            stacked = jax.device_put(pp.pack_pipeline_params(spec, variables), sh)
            tmask, smask = pp.pack_pipeline_masks(spec, variables)
            tmask, smask = jax.device_put(tmask, sh), jax.device_put(smask, sh)
            imgs = jax.device_put(images, pp.pipeline_batch_sharding(mesh))
            labs = jax.device_put(labels, pp.pipeline_batch_sharding(mesh))

            step = pp.make_pipeline_train_step(spec, mesh, lr=self.LR, momentum=self.MOM)
            mu0 = jax.device_put(jnp.zeros_like(stacked), sh)
            stacked2, mu2, loss = step(stacked, mu0, tmask, smask, imgs, labs)
            got_p = pp.unpack_pipeline_params(spec, np.asarray(stacked2))
            got_mu = pp.unpack_pipeline_params(spec, np.asarray(mu2))

            # sequential reference: per data shard, chain the M microbatches
            # (micro-batch BN, running stats threaded), mean the per-microbatch
            # masked-CE means; then data-average grads/stats and apply SGD.
            gs, losses, stats = [], [], []
            for d in range(self.D):
                sl = slice(d * self.MB, (d + 1) * self.MB)

                def loss_fn(v, sl=sl):
                    cur, total = v, jnp.float64(0.0)
                    for m in range(self.M):
                        logits, new = _tiny_seq_forward(cur, images[m, sl], True)
                        cur = _merge_bn_stats(cur, new)
                        total = total + pp._masked_ce(logits, labels[m, sl])
                    return total / self.M, cur

                (l, curN), g = jax.value_and_grad(loss_fn, has_aux=True)(variables)
                gs.append(g); losses.append(l); stats.append(curN)
            g = jax.tree_util.tree_map(lambda *a: sum(a) / self.D, *gs)
            statsN = jax.tree_util.tree_map(lambda *a: sum(a) / self.D, *stats)
            ref_loss = float(sum(losses) / self.D)

            assert abs(float(loss) - ref_loss) < 1e-12

            def ref_update(path, p, gl, st):
                if _leaf_name(path) in BN_STAT_KEYS:
                    return st, jnp.zeros_like(p)
                mu = self.MOM * jnp.zeros_like(p) + gl
                return p - self.LR * mu, mu

            upd = jax.tree_util.tree_map_with_path(ref_update, variables, g, statsN)
            istup = lambda t: isinstance(t, tuple)
            ref_p = jax.tree_util.tree_map(lambda t: t[0], upd, is_leaf=istup)
            ref_mu = jax.tree_util.tree_map(lambda t: t[1], upd, is_leaf=istup)

            # params (incl. chained+averaged BN stats): near-exact in f64
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-12, atol=1e-13
                ),
                got_p, ref_p,
            )
            # momentum: absolute tolerance at the tree's own scale (conv-bias
            # grads ahead of BN are mathematically 0 — pure cancellation noise)
            scale = max(
                float(jnp.max(jnp.abs(l))) for l in jax.tree_util.tree_leaves(ref_mu)
            )
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12 * scale
                ),
                got_mu, ref_mu,
            )


class TestPipelineRemat:
    """GPipe + remat composition: checkpointing each stage program must not
    change the math — params, momentum and loss of one remat train step equal
    the plain pipeline step exactly (f64)."""

    _setup = TestPipelineTinyExact._setup
    S, D, MB, M, IMG, K = TestPipelineTinyExact.S, TestPipelineTinyExact.D, \
        TestPipelineTinyExact.MB, TestPipelineTinyExact.M, \
        TestPipelineTinyExact.IMG, TestPipelineTinyExact.K
    LR, MOM = TestPipelineTinyExact.LR, TestPipelineTinyExact.MOM

    def test_remat_step_equals_plain_step(self):
        with jax.enable_x64():
            variables, images, labels, mesh, spec = self._setup()
            sh = pp.pipeline_param_sharding(mesh)
            bsh = pp.pipeline_batch_sharding(mesh)
            stacked = jax.device_put(pp.pack_pipeline_params(spec, variables), sh)
            tmask, smask = pp.pack_pipeline_masks(spec, variables)
            tmask, smask = jax.device_put(tmask, sh), jax.device_put(smask, sh)
            imgs = jax.device_put(images, bsh)
            labs = jax.device_put(labels, bsh)

            outs = []
            for remat in (False, True):
                step = pp.make_pipeline_train_step(
                    spec, mesh, lr=self.LR, momentum=self.MOM, remat=remat
                )
                # donate_argnums: hand each run its own buffers
                p0 = jax.device_put(pp.pack_pipeline_params(spec, variables), sh)
                m0 = jax.device_put(jnp.zeros_like(stacked), sh)
                outs.append(step(p0, m0, tmask, smask, imgs, labs))
            (p_a, mu_a, l_a), (p_b, mu_b, l_b) = outs
            assert float(l_a) == pytest.approx(float(l_b), rel=0, abs=1e-14)
            np.testing.assert_allclose(
                np.asarray(p_b), np.asarray(p_a), rtol=1e-13, atol=1e-14
            )
            np.testing.assert_allclose(
                np.asarray(mu_b), np.asarray(mu_a), rtol=1e-13, atol=1e-14
            )


class TestPipelineFlagship:
    """The real model through the same machinery (f32)."""

    def test_spec_covers_flagship_and_roundtrips(self):
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init, truncated_moco_init,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, 8),
            "classifier": classifier_init(k2, 256, 4),
        }
        n_units = pp.FLAGSHIP_UNITS.num_units
        assert n_units == 18  # stem + 16 bottleneck blocks + heads
        for s in (2, 4, 8, 18):
            spec = pp.make_pipeline_spec(variables, s, 2, 64)
            assert spec.num_classes == 4
            assert spec.stage_units[0][0] == 0
            assert spec.stage_units[-1][1] == n_units
            # contiguous cover, no empty stage
            assert all(a < b for a, b in spec.stage_units)
            assert all(
                spec.stage_units[i][1] == spec.stage_units[i + 1][0]
                for i in range(s - 1)
            )
            # activation buffer covers the widest boundary incl. the input
            assert spec.act_flat >= 2 * 64 * 64 * 3
            rt = pp.unpack_pipeline_params(spec, pp.pack_pipeline_params(spec, variables))
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
                variables, rt,
            )
        # params-balanced grouping beats layer-granularity maxP (15.5M) by 2x
        spec4 = pp.make_pipeline_spec(variables, 4, 2, 64)
        assert spec4.max_params < 8_000_000
        # legacy by-count grouping still available
        specu = pp.make_pipeline_spec(variables, 4, 2, 64, balance="units")
        assert specu.stage_units == ((0, 5), (5, 10), (10, 14), (14, 18))

    def test_eval_equals_single_device(self):
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init, combined_apply, truncated_moco_init,
        )

        S, D, MB, M, IMG, TRUNC = 4, 2, 1, 2, 32, 8
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, TRUNC),
            "classifier": classifier_init(k2, 256, 4),
        }
        rng = np.random.RandomState(1)
        images = jnp.asarray(rng.rand(M, MB * D, IMG, IMG, 3), jnp.float32)
        mesh = pp.make_mesh_pipeline(S * D, pipe=S)
        spec = pp.make_pipeline_spec(variables, S, MB, IMG)
        stacked = jax.device_put(
            pp.pack_pipeline_params(spec, variables), pp.pipeline_param_sharding(mesh)
        )
        imgs = jax.device_put(images, pp.pipeline_batch_sharding(mesh))
        got = np.asarray(pp.make_pipeline_eval_step(spec, mesh)(stacked, imgs))
        ref = np.stack([
            np.asarray(
                combined_apply(variables["moco"], variables["classifier"], images[m], TRUNC)[0]
            )
            for m in range(M)
        ])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_truncated_units_eval_equals_single_device(self):
        """make_flagship_units(truncate<8): the pipeline decomposition must
        follow the configured truncation (SURVEY M1 truncate_after_layer),
        not just the truncate-8 flagship."""
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init, combined_apply, truncated_moco_init,
        )

        S, D, MB, M, IMG, TRUNC = 2, 4, 1, 2, 32, 5
        k1, k2 = jax.random.split(jax.random.PRNGKey(3))
        variables = {
            "moco": truncated_moco_init(k1, TRUNC, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }
        units = pp.make_flagship_units(TRUNC)
        assert units.num_units == 5  # stem + 3 layer1 blocks + heads
        rng = np.random.RandomState(4)
        images = jnp.asarray(rng.rand(M, MB * D, IMG, IMG, 3), jnp.float32)
        mesh = pp.make_mesh_pipeline(S * D, pipe=S)
        spec = pp.make_pipeline_spec(variables, S, MB, IMG, units=units)
        stacked = jax.device_put(
            pp.pack_pipeline_params(spec, variables), pp.pipeline_param_sharding(mesh)
        )
        imgs = jax.device_put(images, pp.pipeline_batch_sharding(mesh))
        got = np.asarray(pp.make_pipeline_eval_step(spec, mesh)(stacked, imgs))
        ref = np.stack([
            np.asarray(
                combined_apply(variables["moco"], variables["classifier"], images[m], TRUNC)[0]
            )
            for m in range(M)
        ])
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
        # pack/unpack roundtrip with the truncated tree
        rt = pp.unpack_pipeline_params(spec, pp.pack_pipeline_params(spec, variables))
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            variables, rt,
        )

    @pytest.mark.skipif(
        os.environ.get("RUN_SLOW") != "1",
        reason="flagship pp train step: ~2 min compile on 1-core CI; the "
        "driver dryrun executes it every round",
    )
    def test_train_step_runs(self):
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init, truncated_moco_init,
        )

        S, D, MB, M, IMG = 4, 2, 1, 2, 32
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, 8),
            "classifier": classifier_init(k2, 256, 4),
        }
        rng = np.random.RandomState(1)
        images = jnp.asarray(rng.rand(M, MB * D, IMG, IMG, 3), jnp.float32)
        labels = jnp.asarray(rng.randint(0, 4, size=(M, MB * D)).astype(np.int32))
        mesh = pp.make_mesh_pipeline(S * D, pipe=S)
        spec = pp.make_pipeline_spec(variables, S, MB, IMG)
        sh = pp.pipeline_param_sharding(mesh)
        stacked = jax.device_put(pp.pack_pipeline_params(spec, variables), sh)
        tmask, smask = pp.pack_pipeline_masks(spec, variables)
        tmask, smask = jax.device_put(tmask, sh), jax.device_put(smask, sh)
        step = pp.make_pipeline_train_step(spec, mesh, lr=0.01)
        s2, mu2, loss = step(
            stacked,
            jax.device_put(jnp.zeros_like(stacked), sh),
            tmask,
            smask,
            jax.device_put(images, pp.pipeline_batch_sharding(mesh)),
            jax.device_put(labels, pp.pipeline_batch_sharding(mesh)),
        )
        assert np.isfinite(float(loss))
        assert np.all(np.isfinite(np.asarray(s2)))
