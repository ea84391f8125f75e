"""Per-host data sharding + global batch assembly (single-process emulation).

The HostLoader process-sharding contract: all hosts derive the SAME global
permutation from (seed, epoch), take disjoint strides of it, run the same
number of steps, and mark padding with label -1 — exactly once per real
sample per epoch across the fleet.
"""
import os

import jax
import numpy as np
import pytest
from PIL import Image

from heuristique_style_transfer_code_tpu.data.loader import HostLoader


@pytest.fixture(scope="module")
def samples(tmp_path_factory):
    root = tmp_path_factory.mktemp("mhdata")
    rng = np.random.RandomState(0)
    out = []
    for i in range(11):  # deliberately awkward count
        p = str(root / f"s{i}.png")
        Image.fromarray(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)).save(p)
        out.append((p, i % 4))
    return out


def _collect(loader):
    batches = list(loader)
    idxs, labels = [], []
    for b in batches:
        idxs.extend(b["indices"].tolist())
        labels.extend(b["label"].tolist())
    return batches, np.asarray(idxs), np.asarray(labels)


class TestProcessSharding:
    @pytest.mark.parametrize("pc", [2, 3])
    def test_disjoint_exact_cover(self, samples, pc):
        per_host = []
        for pi in range(pc):
            loader = HostLoader(
                samples, batch_size=2, shuffle=True, seed=5,
                process_index=pi, process_count=pc, num_workers=2,
            )
            per_host.append(_collect(loader))
        # same number of steps on every host (pjit requirement)
        steps = {len(b) for b, _, _ in per_host}
        assert len(steps) == 1
        # valid (label != -1) entries cover each sample exactly once
        seen = []
        for _, idxs, labels in per_host:
            seen.extend(idxs[labels >= 0].tolist())
        assert sorted(seen) == list(range(len(samples)))

    def test_same_global_permutation_across_hosts(self, samples):
        # hosts must agree on the epoch order without communicating:
        # host strides interleave back into one permutation of the samples
        pc = 2
        strides = []
        for pi in range(pc):
            loader = HostLoader(
                samples, batch_size=2, shuffle=True, seed=9,
                process_index=pi, process_count=pc, num_workers=2,
            )
            order, valid = loader._order()
            strides.append((order, valid))
        total = sum(len(o) for o, _ in strides)
        merged = np.empty(total, dtype=int)
        merged_valid = np.empty(total, dtype=bool)
        for pi, (o, v) in enumerate(strides):
            merged[pi::pc] = o
            merged_valid[pi::pc] = v
        real = merged[merged_valid]
        assert sorted(real.tolist()) == list(range(len(samples)))
        # and it equals the single-host permutation for the same seed/epoch
        solo = HostLoader(samples, batch_size=2, shuffle=True, seed=9)
        np.testing.assert_array_equal(solo._order()[0], real)

    def test_padding_marked_invalid(self, samples):
        loader = HostLoader(
            samples, batch_size=4, process_index=0, process_count=2,
            num_workers=2,
        )
        batches, idxs, labels = _collect(loader)
        n_valid = sum(b["n_valid"] for b in batches)
        assert n_valid == int((labels >= 0).sum())
        assert (labels >= 0).sum() <= len(samples)

    def test_single_host_unchanged(self, samples):
        a = _collect(HostLoader(samples, batch_size=4, shuffle=True, seed=3))
        b = _collect(
            HostLoader(
                samples, batch_size=4, shuffle=True, seed=3,
                process_index=0, process_count=1,
            )
        )
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_array_equal(a[2], b[2])


_WORKER = r'''
import sys

pid, port, data_root, out_path = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh

from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
from heuristique_style_transfer_code_tpu.data.imagefolder import ImageFolderIndex
from heuristique_style_transfer_code_tpu.data.loader import HostLoader
from heuristique_style_transfer_code_tpu.parallel.multihost import global_batch_dict
from heuristique_style_transfer_code_tpu.parallel.sharding import (
    batch_sharding, image_sharding, make_sharded_train_step,
)
from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum

mesh = Mesh(np.asarray(jax.devices()).reshape(4, 1), ("data", "model"))
dim = 32 * 32 * 3
variables = {
    "w": jnp.asarray(np.random.RandomState(0).randn(dim, 2).astype(np.float32) * 0.01),
    "b": jnp.zeros((2,), jnp.float32),
}

def forward_train(v, images):
    return images.reshape(images.shape[0], -1) @ v["w"] + v["b"], v

optimizer = sgd_momentum(0.05, variables)
augment = make_augment_fn([(None, None)], crop=32)
step, v_shard = make_sharded_train_step(forward_train, optimizer, augment, mesh, variables)
variables = jax.device_put(variables, v_shard)
opt_state = optimizer.init(variables)

dataset = ImageFolderIndex(data_root)
loader = HostLoader(
    dataset.samples, 2, shuffle=True, seed=5,
    process_index=pid, process_count=2, num_workers=2,
)
key = jax.random.PRNGKey(9)
losses = []
for batch in loader:
    key, sub = jax.random.split(key)
    g = global_batch_dict(batch, image_sharding(mesh), batch_sharding(mesh))
    variables, opt_state, loss = step(
        variables, opt_state, g["image"], g["label"], g["combo"], sub
    )
    losses.append(float(loss))

final = {k: np.asarray(v) for k, v in variables.items()}
np.savez(out_path, losses=np.asarray(losses), **final)
print(f"proc{pid} ok: losses={losses}")
'''


class TestTwoProcessTraining:
    def test_two_process_training_matches_single_process(self, tmp_path):
        """REAL multi-process run: 2 JAX processes x 2 virtual CPU devices,
        Gloo collectives, each host feeding its HostLoader stride through
        make_array_from_process_local_data into the sharded train step.
        Losses and final weights must equal (to f32 tolerance) a
        single-process run over the identical global batches, and be
        identical across the two processes."""
        import socket
        import subprocess
        import sys

        import jax.numpy as jnp
        from jax.sharding import Mesh

        from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            make_sharded_train_step,
        )
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum

        rng = np.random.RandomState(3)
        data_root = str(tmp_path / "train")
        for cls in ("a", "b"):
            d = tmp_path / "train" / cls
            d.mkdir(parents=True)
            for i in range(6):
                Image.fromarray(
                    rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
                ).save(str(d / f"{i}.png"))

        with socket.socket() as s:  # free port
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]

        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("JAX", "XLA"))}
        env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        outs = [str(tmp_path / f"proc{i}.npz") for i in range(2)]
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(i), str(port), data_root, outs[i]],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for i in range(2)
        ]
        logs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=420)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            logs.append(out)
        assert all(p.returncode == 0 for p in procs), "\n".join(logs)[-3000:]

        with np.load(outs[0]) as a, np.load(outs[1]) as b:
            np.testing.assert_array_equal(a["losses"], b["losses"])
            np.testing.assert_array_equal(a["w"], b["w"])
            ra = {k: a[k].copy() for k in a.files}

        # single-process reference over the IDENTICAL global batches:
        # global rows = [host0 local batch; host1 local batch] (device order)
        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )

        dataset = ImageFolderIndex(data_root)
        loaders = [
            HostLoader(dataset.samples, 2, shuffle=True, seed=5,
                       process_index=i, process_count=2, num_workers=2)
            for i in range(2)
        ]
        mesh1 = Mesh(np.asarray(jax.devices("cpu")[:4]).reshape(4, 1),
                     ("data", "model"))
        dim = 32 * 32 * 3
        variables = {
            "w": jnp.asarray(
                np.random.RandomState(0).randn(dim, 2).astype(np.float32) * 0.01
            ),
            "b": jnp.zeros((2,), jnp.float32),
        }

        def forward_train(v, images):
            return images.reshape(images.shape[0], -1) @ v["w"] + v["b"], v

        optimizer = sgd_momentum(0.05, variables)
        augment = make_augment_fn([(None, None)], crop=32)
        step, v_shard = make_sharded_train_step(
            forward_train, optimizer, augment, mesh1, variables
        )
        variables = jax.device_put(variables, v_shard)
        opt_state = optimizer.init(variables)
        key = jax.random.PRNGKey(9)
        losses = []
        for b0, b1 in zip(*loaders):
            key, sub = jax.random.split(key)
            variables, opt_state, loss = step(
                variables, opt_state,
                jnp.asarray(np.concatenate([b0["image"], b1["image"]])),
                jnp.asarray(np.concatenate([b0["label"], b1["label"]])),
                jnp.asarray(np.concatenate([b0["combo"], b1["combo"]])),
                sub,
            )
            losses.append(float(loss))

        np.testing.assert_allclose(ra["losses"], np.asarray(losses), rtol=1e-6)
        np.testing.assert_allclose(
            ra["w"], np.asarray(variables["w"]), rtol=1e-6, atol=1e-7
        )


class TestGlobalBatchAssembly:
    def test_make_global_batch_on_mesh(self, samples):
        import jax

        from heuristique_style_transfer_code_tpu.parallel.multihost import (
            global_batch_dict,
            initialize_distributed,
        )
        from heuristique_style_transfer_code_tpu.parallel.sharding import (
            batch_sharding,
            image_sharding,
            make_mesh_2d,
        )

        assert initialize_distributed() == 0  # single-process no-op
        mesh = make_mesh_2d(8, model_parallel=2)
        loader = HostLoader(samples, batch_size=8, num_workers=2)
        batch = next(iter(loader))
        g = global_batch_dict(batch, image_sharding(mesh), batch_sharding(mesh))
        assert g["image"].shape == batch["image"].shape  # pc=1: global==local
        assert g["label"].sharding.is_equivalent_to(batch_sharding(mesh), 1)
        np.testing.assert_array_equal(np.asarray(g["image"]), batch["image"])
        # sharded arrays feed a jitted reduction without host round-trips
        total = jax.jit(lambda x: x.astype(jax.numpy.int32).sum())(g["image"])
        assert int(total) == int(batch["image"].astype(np.int64).sum())
