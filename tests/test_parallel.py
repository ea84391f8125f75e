"""Mesh/sharding tests on the 8-virtual-device CPU backend (SURVEY.md §4(d))."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from heuristique_style_transfer_code_tpu.core.mesh import create_mesh, data_sharding


class TestDataParallelMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8

    def test_data_sharding_roundtrip(self):
        mesh = create_mesh()
        x = np.arange(16 * 4, dtype=np.float32).reshape(16, 4)
        xs = jax.device_put(x, data_sharding(mesh))
        assert len(xs.sharding.device_set) == 8
        np.testing.assert_array_equal(np.asarray(xs), x)

    def test_psum_matches_sum(self):
        mesh = create_mesh()
        x = np.arange(8, dtype=np.float32)
        xs = jax.device_put(x, data_sharding(mesh))
        total = jax.jit(lambda a: jnp.sum(a))(xs)
        assert float(total) == x.sum()


class TestShardedTrainStep:
    def test_dp_tp_train_step_runs_and_matches_single_device(self):
        """The 4x2 (data x model) sharded step must produce the same loss as
        the unsharded step — sharding is a layout, not a semantics change."""
        from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            batch_sharding,
            make_mesh_2d,
            make_sharded_train_step,
        )
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import make_train_step

        truncate = 5
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, truncate, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }

        def forward_train(v, images):
            logits, new_v = combined_apply(
                v["moco"], v["classifier"], images, truncate, train=True
            )
            return logits, {"moco": new_v, "classifier": v["classifier"]}

        optimizer = sgd_momentum(0.01, variables)
        augment = make_augment_fn([(None, None)], crop=64)

        rng = np.random.RandomState(0)
        images = rng.randint(0, 256, (8, 96, 96, 3), dtype=np.uint8)
        labels = np.arange(8, dtype=np.int32) % 4
        combos = np.zeros(8, dtype=np.int32)
        key = jax.random.PRNGKey(1)

        # the steps donate their inputs; keep a host-side master copy
        host_vars = jax.tree_util.tree_map(np.asarray, variables)

        # single-device reference
        step1 = make_train_step(forward_train, optimizer, augment)
        v_in = jax.tree_util.tree_map(jnp.asarray, host_vars)
        v1, o1, loss1 = step1(
            v_in, optimizer.init(v_in), images, labels, combos, key
        )

        # sharded
        mesh = make_mesh_2d(8)
        assert dict(mesh.shape) == {"data": 4, "model": 2}
        stepN, v_shard = make_sharded_train_step(
            forward_train, optimizer, augment, mesh, host_vars
        )
        vs = jax.device_put(host_vars, v_shard)
        os_ = optimizer.init(vs)
        imgs_s = jax.device_put(jnp.asarray(images), batch_sharding(mesh))
        lbl_s = jax.device_put(jnp.asarray(labels), batch_sharding(mesh))
        cmb_s = jax.device_put(jnp.asarray(combos), batch_sharding(mesh))
        vN, oN, lossN = stepN(vs, os_, imgs_s, lbl_s, cmb_s, key)

        np.testing.assert_allclose(float(loss1), float(lossN), rtol=1e-4)
        # parameters after the step must agree too (grad all-reduce correct)
        k_single = np.asarray(v1["classifier"]["fc"]["kernel"])
        k_shard = np.asarray(vN["classifier"]["fc"]["kernel"])
        np.testing.assert_allclose(k_single, k_shard, rtol=1e-3, atol=1e-5)

    def test_head_kernels_are_model_sharded(self):
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_2d,
            variable_shardings,
        )

        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, 5, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }
        mesh = make_mesh_2d(8)
        shardings = variable_shardings(variables, mesh)
        moco_fc = shardings["moco"]["fc"]["kernel"]
        assert moco_fc.spec == jax.sharding.PartitionSpec(None, "model")
        conv1 = shardings["moco"]["encoder"]["conv1"]["kernel"]
        assert conv1.spec == jax.sharding.PartitionSpec()


class TestZero1:
    def test_zero1_matches_plain_dp_and_shards_momentum(self):
        """ZeRO-1 is a layout change, not a semantics change: losses and
        updated parameters must match the single-device step, while each
        device physically stores only 1/D of the momentum buffers."""
        from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            DATA_AXIS,
            batch_sharding,
            make_zero1_train_step,
        )
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import make_train_step
        from jax.sharding import Mesh

        truncate = 5
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, truncate, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }

        def forward_train(v, images):
            logits, new_v = combined_apply(
                v["moco"], v["classifier"], images, truncate, train=True
            )
            return logits, {"moco": new_v, "classifier": v["classifier"]}

        optimizer = sgd_momentum(0.01, variables)
        augment = make_augment_fn([(None, None)], crop=64)

        rng = np.random.RandomState(0)
        images = rng.randint(0, 256, (8, 96, 96, 3), dtype=np.uint8)
        labels = np.arange(8, dtype=np.int32) % 4
        combos = np.zeros(8, dtype=np.int32)
        key = jax.random.PRNGKey(1)
        host_vars = jax.tree_util.tree_map(np.asarray, variables)

        # single-device reference: TWO steps (the second consumes nonzero
        # momentum, so it actually exercises the sharded-state data path)
        step1 = make_train_step(forward_train, optimizer, augment)
        v1 = jax.tree_util.tree_map(jnp.asarray, host_vars)
        o1 = optimizer.init(v1)
        v1, o1, loss1_a = step1(v1, o1, images, labels, combos, key)
        v1, o1, loss1_b = step1(v1, o1, images, labels, combos, key)

        # ZeRO-1 over a pure 8-way data mesh
        mesh = Mesh(np.asarray(jax.devices()).reshape(8), (DATA_AXIS,))
        vz = jax.tree_util.tree_map(jnp.asarray, host_vars)
        oz_host = optimizer.init(vz)
        stepz, o_shard = make_zero1_train_step(
            forward_train, optimizer, augment, mesh, host_vars, oz_host
        )
        oz = jax.device_put(oz_host, o_shard)
        data = batch_sharding(mesh)
        imgs_s = jax.device_put(jnp.asarray(images), data)
        lbl_s = jax.device_put(jnp.asarray(labels), data)
        cmb_s = jax.device_put(jnp.asarray(combos), data)
        vz, oz, lossz_a = stepz(vz, oz, imgs_s, lbl_s, cmb_s, key)

        # momentum buffers are physically 1/8 per device (the ZeRO-1 claim)
        mom = jax.tree_util.tree_leaves(oz)
        big = [m for m in mom if hasattr(m, "shape") and m.size >= 64]
        assert big, "expected momentum leaves"
        sharded = 0
        for m in big:
            shard = m.addressable_shards[0].data
            if shard.size * 8 == m.size:
                sharded += 1
        # every >=64-element leaf has an 8-divisible dim in this model
        assert sharded == len(big), (sharded, len(big))

        vz, oz, lossz_b = stepz(vz, oz, imgs_s, lbl_s, cmb_s, key)

        np.testing.assert_allclose(float(loss1_a), float(lossz_a), rtol=1e-5)
        np.testing.assert_allclose(float(loss1_b), float(lossz_b), rtol=1e-5)
        k_single = np.asarray(v1["classifier"]["fc"]["kernel"])
        k_zero = np.asarray(vz["classifier"]["fc"]["kernel"])
        np.testing.assert_allclose(k_single, k_zero, rtol=1e-4, atol=1e-6)


    def test_fsdp_matches_single_device_and_shards_params(self):
        """FSDP/ZeRO-3: params AND momentum stored 1/D; two steps must match
        the single-device trajectory (all-gather at use + reduce-scatter
        into the sharded update is a layout, not a semantics change)."""
        from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            DATA_AXIS,
            batch_sharding,
            make_fsdp_train_step,
        )
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import make_train_step
        from jax.sharding import Mesh

        truncate = 5
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, truncate, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }

        def forward_train(v, images):
            logits, new_v = combined_apply(
                v["moco"], v["classifier"], images, truncate, train=True
            )
            return logits, {"moco": new_v, "classifier": v["classifier"]}

        optimizer = sgd_momentum(0.01, variables)
        augment = make_augment_fn([(None, None)], crop=64)
        rng = np.random.RandomState(0)
        images = rng.randint(0, 256, (8, 96, 96, 3), dtype=np.uint8)
        labels = np.arange(8, dtype=np.int32) % 4
        combos = np.zeros(8, dtype=np.int32)
        key = jax.random.PRNGKey(1)
        host_vars = jax.tree_util.tree_map(np.asarray, variables)

        step1 = make_train_step(forward_train, optimizer, augment)
        v1 = jax.tree_util.tree_map(jnp.asarray, host_vars)
        o1 = optimizer.init(v1)
        v1, o1, loss1_a = step1(v1, o1, images, labels, combos, key)
        v1, o1, loss1_b = step1(v1, o1, images, labels, combos, key)

        mesh = Mesh(np.asarray(jax.devices()).reshape(8), (DATA_AXIS,))
        vf = jax.tree_util.tree_map(jnp.asarray, host_vars)
        of_host = optimizer.init(vf)
        stepf, v_shard, o_shard = make_fsdp_train_step(
            forward_train, optimizer, augment, mesh, host_vars, of_host
        )
        vf = jax.device_put(vf, v_shard)
        of = jax.device_put(of_host, o_shard)
        data = batch_sharding(mesh)
        imgs_s = jax.device_put(jnp.asarray(images), data)
        lbl_s = jax.device_put(jnp.asarray(labels), data)
        cmb_s = jax.device_put(jnp.asarray(combos), data)
        vf, of, lossf_a = stepf(vf, of, imgs_s, lbl_s, cmb_s, key)

        # parameter leaves are physically 1/8 per device (the FSDP claim)
        big = [
            m for m in jax.tree_util.tree_leaves(vf)
            if hasattr(m, "shape") and m.size >= 64
        ]
        assert big and all(
            m.addressable_shards[0].data.size * 8 == m.size for m in big
        )

        vf, of, lossf_b = stepf(vf, of, imgs_s, lbl_s, cmb_s, key)
        np.testing.assert_allclose(float(loss1_a), float(lossf_a), rtol=1e-5)
        np.testing.assert_allclose(float(loss1_b), float(lossf_b), rtol=1e-5)
        k_single = np.asarray(v1["classifier"]["fc"]["kernel"])
        k_fsdp = np.asarray(vf["classifier"]["fc"]["kernel"])
        np.testing.assert_allclose(k_single, k_fsdp, rtol=1e-4, atol=1e-6)

    def test_factory_zero1_matches_and_cli_flag_parses(self):
        """The --zero1 CLI path: FamilySetup(zero1=True) must train
        identically to the replicated-state setup while the post-step state
        is physically sharded."""
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            build_parser,
        )
        from heuristique_style_transfer_code_tpu.config.schema import (
            TruncatedResNetConfig,
        )
        from heuristique_style_transfer_code_tpu.core.mesh import create_mesh
        from heuristique_style_transfer_code_tpu.train.factories import (
            setup_truncated_resnet50,
        )
        from jax.sharding import NamedSharding, PartitionSpec as P

        args = build_parser().parse_args(
            ["--data", "x", "--config_path", "y", "--zero1"]
        )
        assert args.zero1 is True

        cfg = TruncatedResNetConfig(batch_size=8, lr=0.01, truncate_layer=5,
                                    seed=0, dim=16)
        mesh = create_mesh(8)
        combos = [(None, None)]
        key = jax.random.PRNGKey(0)
        rng = np.random.RandomState(1)
        images = rng.randint(0, 256, (8, 96, 96, 3), dtype=np.uint8)
        labels = np.arange(8, dtype=np.int32) % 4
        cmb = np.zeros(8, dtype=np.int32)
        akey = jax.random.PRNGKey(2)

        losses, states = [], []
        for zero1 in (False, True):
            setup = setup_truncated_resnet50(
                cfg, 4, combos, mesh=mesh, zero1=zero1
            )
            v, o = setup.init(key)
            v, o, loss = setup.train_step(v, o, images, labels, cmb, akey)
            losses.append(float(loss))
            states.append(o)
        np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
        big = [
            m for m in jax.tree_util.tree_leaves(states[1])
            if hasattr(m, "shape") and m.size >= 64
        ]
        assert big and all(
            m.addressable_shards[0].data.size * 8 == m.size for m in big
        )
        repl = NamedSharding(mesh, P())
        assert all(
            m.sharding == repl
            for m in jax.tree_util.tree_leaves(states[0])
            if hasattr(m, "sharding")
        )


class TestElasticResharding:
    def test_checkpoint_roundtrip_across_mesh_sizes(self, tmp_path):
        """Elastic topology change: train a ZeRO-1-sharded step on an
        8-device mesh, checkpoint through the ordinary npz path, restore
        onto a 4-device mesh and continue — the trajectory must equal an
        uninterrupted single-device run. Checkpoints are host trees, so
        resharding is free by design; this pins that property."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            DATA_AXIS,
            batch_sharding,
            make_zero1_train_step,
        )
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import make_train_step
        from jax.sharding import Mesh

        truncate = 5
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        variables = {
            "moco": truncated_moco_init(k1, truncate, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }

        def forward_train(v, images):
            logits, new_v = combined_apply(
                v["moco"], v["classifier"], images, truncate, train=True
            )
            return logits, {"moco": new_v, "classifier": v["classifier"]}

        optimizer = sgd_momentum(0.01, variables)
        augment = make_augment_fn([(None, None)], crop=64)
        rng = np.random.RandomState(3)
        images = rng.randint(0, 256, (8, 96, 96, 3), dtype=np.uint8)
        labels = np.arange(8, dtype=np.int32) % 4
        combos = np.zeros(8, dtype=np.int32)
        key = jax.random.PRNGKey(9)
        host_vars = jax.tree_util.tree_map(np.asarray, variables)

        # uninterrupted single-device reference, two steps
        step1 = make_train_step(forward_train, optimizer, augment)
        v1 = jax.tree_util.tree_map(jnp.asarray, host_vars)
        o1 = optimizer.init(v1)
        v1, o1, _ = step1(v1, o1, images, labels, combos, key)
        v1, o1, loss_ref = step1(v1, o1, images, labels, combos, key)

        # step 1 on an 8-device ZeRO-1 mesh
        mesh8 = Mesh(np.asarray(jax.devices()).reshape(8), (DATA_AXIS,))
        v8 = jax.tree_util.tree_map(jnp.asarray, host_vars)
        o8h = optimizer.init(v8)
        step8, osh8 = make_zero1_train_step(
            forward_train, optimizer, augment, mesh8, host_vars, o8h
        )
        d8 = batch_sharding(mesh8)
        v8, o8, _ = step8(
            v8,
            jax.device_put(o8h, osh8),
            jax.device_put(jnp.asarray(images), d8),
            jax.device_put(jnp.asarray(labels), d8),
            jax.device_put(jnp.asarray(combos), d8),
            key,
        )

        # checkpoint (ordinary npz host trees — gathers the shards)
        save_pytree_npz(v8, str(tmp_path / "v.npz"))
        save_pytree_npz(o8, str(tmp_path / "o.npz"))
        vr = load_pytree_npz(str(tmp_path / "v.npz"))
        orr = load_pytree_npz(str(tmp_path / "o.npz"))
        # npz trees are flat-keyed dicts of arrays; opt state needs its
        # original structure back
        orr = jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(o8h),
            jax.tree_util.tree_leaves(orr),
        )

        # step 2 on a DIFFERENT topology: 4-device ZeRO-1 mesh
        mesh4 = Mesh(np.asarray(jax.devices()[:4]).reshape(4), (DATA_AXIS,))
        step4, osh4 = make_zero1_train_step(
            forward_train, optimizer, augment, mesh4, host_vars, orr
        )
        d4 = batch_sharding(mesh4)
        v4, o4, loss4 = step4(
            jax.tree_util.tree_map(jnp.asarray, vr),
            jax.device_put(orr, osh4),
            jax.device_put(jnp.asarray(images), d4),
            jax.device_put(jnp.asarray(labels), d4),
            jax.device_put(jnp.asarray(combos), d4),
            key,
        )
        np.testing.assert_allclose(float(loss4), float(loss_ref), rtol=1e-5)
        np.testing.assert_allclose(
            np.asarray(v4["classifier"]["fc"]["kernel"]),
            np.asarray(v1["classifier"]["fc"]["kernel"]),
            rtol=1e-4, atol=1e-6,
        )


class TestShardedEval:
    def test_jit_eval_step_shards_batch_and_matches_single_device(self):
        """VERDICT r1 #3: the eval path must actually use the mesh — sharded
        placement, identical numerics."""
        from heuristique_style_transfer_code_tpu.core.mesh import (
            create_mesh,
            jit_eval_step,
        )

        w = jnp.asarray(np.random.RandomState(0).randn(12, 4), jnp.float32)

        def step(v, x):
            return jnp.tanh(x @ v)

        x = jnp.asarray(np.random.RandomState(1).randn(16, 12), jnp.float32)
        single = jit_eval_step(step, None)(w, x)
        mesh = create_mesh(8)
        sharded = jit_eval_step(step, mesh)(w, x)
        assert len(sharded.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(single), np.asarray(sharded), rtol=1e-6)


class TestShardedCameraBatch:
    def test_camera_batch_infer_over_data_mesh_matches_single_device(self):
        """The camera/serving batch path under a data-sharded input: placing
        the uint8 frame batch over an 8-device mesh must not change the
        probabilities (VERDICT r1 weak #5: camera-batch mesh coverage)."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_2d,
        )
        from heuristique_style_transfer_code_tpu.tasks.camera import (
            make_camera_infer_fn,
        )

        rng = np.random.RandomState(3)
        w = jnp.asarray(rng.randn(32 * 32 * 3, 4).astype(np.float32) * 0.01)

        def forward(v, images):
            return images.reshape(images.shape[0], -1) @ v

        infer = make_camera_infer_fn(forward, batch=8, host_downscale=True)
        frames = rng.randint(0, 256, (8, 32, 32, 3), dtype=np.uint8)
        single = np.asarray(infer(w, jnp.asarray(frames)))

        mesh = make_mesh_2d(8, model_parallel=1)
        sharded_in = jax.device_put(
            frames, NamedSharding(mesh, P("data", None, None, None))
        )
        sharded = infer(w, sharded_in)
        assert len(sharded_in.sharding.device_set) == 8
        np.testing.assert_allclose(single, np.asarray(sharded), rtol=1e-5, atol=1e-6)


class TestGraftEntry:
    def test_dryrun_multichip(self):
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_dryrun_multichip_driver_env(self):
        """Regression for round-1 driver failure (MULTICHIP_r01 rc=1): the
        dryrun must force the virtual CPU mesh itself when called in an
        environment with no xla_force_host_platform_device_count flag and the
        platform pinned to the TPU tunnel."""
        import os
        import subprocess
        import sys

        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.pop("_GRAFT_DRYRUN_SUBPROC", None)
        env["JAX_PLATFORMS"] = "axon"  # what sitecustomize pins in this image
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        code = (
            "import sys; sys.path.insert(0, %r); "
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"
            % repo
        )
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=env,
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "dryrun_multichip OK" in proc.stdout
        assert (
            "'data': 2" in proc.stdout
            and "'model': 2" in proc.stdout
            and "'spatial': 2" in proc.stdout
        )

    def test_entry_compiles(self):
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape == (8, 4)
        np.testing.assert_allclose(np.asarray(out).sum(axis=1), 1.0, rtol=1e-4)


class TestMeshSizes:
    @pytest.mark.parametrize("n,want", [(8, {"data": 4, "model": 2}),
                                        (4, {"data": 2, "model": 2}),
                                        (2, {"data": 1, "model": 2}),
                                        (1, {"data": 1, "model": 1})])
    def test_mesh_factorisation(self, n, want):
        from heuristique_style_transfer_code_tpu.parallel.sharding import make_mesh_2d

        mesh = make_mesh_2d(n)
        assert dict(mesh.shape) == want

    def test_dryrun_small_counts(self):
        import __graft_entry__ as g

        g.dryrun_multichip(2)


class TestShardedMultiStep:
    def test_multi_step_with_mesh_matches_unsharded(self):
        """make_train_step_multi over the 4x2 mesh: stacked batches sharded
        on axis 1, same losses as the unsharded multi dispatch."""
        from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
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
        augment = make_augment_fn([(None, None)], crop=64)

        rng = np.random.RandomState(3)
        images = rng.randint(0, 256, (2, 8, 96, 96, 3), dtype=np.uint8)
        labels = (rng.randint(0, 4, (2, 8))).astype(np.int32)
        combos = np.zeros((2, 8), dtype=np.int32)
        keys = jnp.stack([jax.random.PRNGKey(5), jax.random.PRNGKey(6)])

        multi1 = make_train_step_multi(forward_train, optimizer, augment)
        v1 = jax.tree_util.tree_map(jnp.asarray, host_vars)
        v1, o1, losses1 = multi1(
            v1, optimizer.init(v1), images, labels, combos, keys
        )

        from heuristique_style_transfer_code_tpu.core.mesh import create_mesh

        mesh = create_mesh(8)
        multiN = make_train_step_multi(forward_train, optimizer, augment, mesh=mesh)
        vN = jax.tree_util.tree_map(jnp.asarray, host_vars)
        vN, oN, lossesN = multiN(
            vN, optimizer.init(vN), images, labels, combos, keys
        )
        np.testing.assert_allclose(
            np.asarray(losses1), np.asarray(lossesN), rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(v1["classifier"]["fc"]["kernel"]),
            np.asarray(vN["classifier"]["fc"]["kernel"]),
            rtol=1e-3, atol=1e-5,
        )


class TestSpatialPartitioning:
    def test_spatial_eval_matches_single_device(self):
        """SP: image H axis sharded over 'spatial' (GSPMD inserts the conv
        halo exchanges); logits identical to single-device."""
        from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
            classifier_init,
            combined_apply,
            truncated_moco_init,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_mesh_spatial,
            make_spatial_eval_step,
        )

        truncate = 5
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        variables = {
            "moco": truncated_moco_init(k1, truncate, dim=16),
            "classifier": classifier_init(k2, 16, 4),
        }

        def forward_eval(v, images):
            logits, _ = combined_apply(v["moco"], v["classifier"], images, truncate)
            return logits

        rng = np.random.RandomState(0)
        images_u8 = rng.randint(0, 256, (4, 256, 256, 3), dtype=np.uint8)

        from heuristique_style_transfer_code_tpu.data.augment import eval_preprocess

        ref = jax.jit(
            lambda v, x: forward_eval(v, eval_preprocess(x, 224))
        )(variables, jnp.asarray(images_u8))

        mesh = make_mesh_spatial(8, spatial=4)
        assert dict(mesh.shape) == {"data": 2, "spatial": 4}
        step = make_spatial_eval_step(forward_eval, mesh)
        out = step(variables, jnp.asarray(images_u8))
        assert len(out.sharding.device_set) == 8
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
        )


class TestMesh3D:
    @pytest.mark.parametrize("n,want", [
        (8, {"data": 2, "model": 2, "spatial": 2}),
        (4, {"data": 1, "model": 2, "spatial": 2}),
        (2, {"data": 1, "model": 1, "spatial": 2}),
        (1, {"data": 1, "model": 1, "spatial": 1}),
    ])
    def test_mesh3d_factorisation(self, n, want):
        from heuristique_style_transfer_code_tpu.parallel.sharding import make_mesh_3d

        assert dict(make_mesh_3d(n).shape) == want
