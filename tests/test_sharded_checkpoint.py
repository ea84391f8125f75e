"""Distributed sharded checkpoints (checkpoint/sharded_io.py).

Each process writes only the shards it owns; load reassembles under ANY
target sharding (elastic resharding) via jax.make_array_from_callback.
Values must round-trip bit-identically under every (save layout, load
layout) pair, and the on-disk bytes must not duplicate sharded leaves.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heuristique_style_transfer_code_tpu.checkpoint.sharded_io import (
    load_sharded_pytree,
    save_sharded_pytree,
)
from heuristique_style_transfer_code_tpu.parallel.sharding import (
    fsdp_variable_shardings,
    zero1_state_shardings,
)
from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum


def _mesh_1d(n=8):
    return Mesh(np.asarray(jax.devices()[:n]), ("data",))


def _tree_equal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture
def state():
    """Variables + optax (NamedTuple) momentum state, FSDP/ZeRO-1 sharded
    over an 8-device 'data' mesh."""
    mesh = _mesh_1d()
    rng = np.random.RandomState(0)
    variables = {
        "conv": {"kernel": jnp.asarray(rng.randn(3, 3, 16, 32), jnp.float32)},
        "fc": {
            "kernel": jnp.asarray(rng.randn(64, 8), jnp.float32),
            "bias": jnp.asarray(rng.randn(8), jnp.float32),
        },
        "bn": {"scale": jnp.ones((16,), jnp.float32)},  # 16 % 8 == 0: sharded
    }
    opt = sgd_momentum(0.05, variables)
    opt_state = opt.init(variables)
    v_shard = fsdp_variable_shardings(variables, mesh)
    o_shard = zero1_state_shardings(opt_state, mesh)
    variables = jax.device_put(variables, v_shard)
    opt_state = jax.device_put(opt_state, o_shard)
    return mesh, variables, opt_state, v_shard, o_shard, opt


class TestRoundTrip:
    def test_same_layout_bit_identical(self, state, tmp_path):
        mesh, variables, opt_state, v_shard, o_shard, _ = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree((variables, opt_state), d)
        loaded_v, loaded_o = load_sharded_pytree(d, shardings=(v_shard, o_shard))
        _tree_equal(loaded_v, variables)
        _tree_equal(loaded_o, opt_state)
        # the loaded arrays really carry the requested layout
        assert loaded_v["conv"]["kernel"].sharding == v_shard["conv"]["kernel"]

    def test_no_shard_duplication_on_disk(self, state, tmp_path):
        """A 1/D-sharded leaf must be stored once, not D times: the total
        saved elements equal the global tree's elements."""
        mesh, variables, opt_state, v_shard, o_shard, _ = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree((variables, opt_state), d)
        with np.load(os.path.join(d, "shards_p00000.npz")) as z:
            stored = sum(int(z[k].size) for k in z.files)
        want = sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves((variables, opt_state))
        )
        assert stored == want

    def test_chunked_storage_is_real(self, state, tmp_path):
        """The conv kernel must be saved as 8 chunks, each 1/8 of the array
        along the FSDP policy's dim (the largest divisible one: O=32) —
        proof the save path never gathered."""
        mesh, variables, *_ = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree(variables, d)
        with open(os.path.join(d, "manifest_p00000.json")) as f:
            m = json.load(f)
        meta = m["leaves"]["conv/kernel"]
        assert len(meta["chunks"]) == 8
        spans = sorted(
            (c["start"][3], c["stop"][3]) for c in meta["chunks"]
        )
        assert spans == [(i * 4, i * 4 + 4) for i in range(8)]

    def test_bf16_leaf_round_trips(self, tmp_path):
        mesh = _mesh_1d()
        x = jax.device_put(
            jnp.asarray(np.random.RandomState(1).randn(16, 4), jnp.bfloat16),
            NamedSharding(mesh, P("data")),
        )
        d = str(tmp_path / "ckpt")
        save_sharded_pytree({"x": x}, d)
        back = load_sharded_pytree(d, shardings=NamedSharding(mesh, P()))
        np.testing.assert_array_equal(
            np.asarray(back["x"]).view(np.uint16),
            np.asarray(x).view(np.uint16),
        )

    def test_structure_markers_survive(self, tmp_path):
        tree = {
            "a": None,
            "b": {},
            "c": [],
            "d": [jnp.ones((3,)), {"e": jnp.zeros((2, 2))}],
            "s": np.int64(7),
        }
        d = str(tmp_path / "ckpt")
        save_sharded_pytree(tree, d)
        back = load_sharded_pytree(d, as_jax=False)
        assert back["a"] is None and back["b"] == {} and back["c"] == []
        np.testing.assert_array_equal(back["d"][0], np.ones((3,)))
        np.testing.assert_array_equal(back["d"][1]["e"], np.zeros((2, 2)))
        assert int(back["s"]) == 7


class TestElasticReshard:
    def test_load_under_different_layout(self, state, tmp_path):
        """Saved 1/8-sharded, loaded 1/4-sharded on a smaller mesh and
        fully replicated — both bit-identical (a D-device checkpoint
        resumes on D' devices)."""
        mesh, variables, opt_state, v_shard, o_shard, _ = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree((variables, opt_state), d)

        mesh4 = Mesh(np.asarray(jax.devices()[:4]), ("data",))
        v4 = fsdp_variable_shardings(variables, mesh4)
        o4 = zero1_state_shardings(opt_state, mesh4)
        lv, lo = load_sharded_pytree(d, shardings=(v4, o4))
        _tree_equal(lv, variables)
        _tree_equal(lo, opt_state)
        assert lv["conv"]["kernel"].sharding == v4["conv"]["kernel"]

        repl = NamedSharding(mesh, P())
        lv2 = load_sharded_pytree(d, shardings=(
            jax.tree_util.tree_map(lambda _: repl, jax.device_get(variables)),
            jax.tree_util.tree_map(lambda _: repl, jax.device_get(opt_state)),
        ))[0]
        _tree_equal(lv2, variables)

    def test_numpy_load_equals_saved(self, state, tmp_path):
        mesh, variables, *_ = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree(variables, d)
        back = load_sharded_pytree(d, as_jax=False)
        _tree_equal(back, variables)

    def test_like_restores_namedtuple_structure(self, state, tmp_path):
        mesh, variables, opt_state, v_shard, o_shard, opt = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree(opt_state, d)
        template = opt.init(jax.device_get(variables))
        back = load_sharded_pytree(d, shardings=o_shard, like=template)
        assert jax.tree_util.tree_structure(back) == jax.tree_util.tree_structure(
            opt_state
        )
        _tree_equal(back, opt_state)


class TestSafety:
    def test_torn_save_not_loadable(self, state, tmp_path):
        mesh, variables, *_ = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree(variables, d)
        os.unlink(os.path.join(d, "MANIFEST.json"))
        with pytest.raises(FileNotFoundError):
            load_sharded_pytree(d)

    def test_resave_overwrites_cleanly(self, state, tmp_path):
        mesh, variables, *_ = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree(variables, d)
        bumped = jax.tree_util.tree_map(lambda x: x + 1, variables)
        save_sharded_pytree(bumped, d)
        back = load_sharded_pytree(d, as_jax=False)
        _tree_equal(back, bumped)

    def test_missing_sharding_leaf_errors(self, state, tmp_path):
        mesh, variables, *_ = state
        d = str(tmp_path / "ckpt")
        save_sharded_pytree(variables, d)
        wrong = {"conv": {"kernel": NamedSharding(mesh, P())}}  # fc/bn absent
        with pytest.raises(KeyError):
            load_sharded_pytree(d, shardings=wrong)


class TestAsyncShardedWriter:
    def test_submit_is_donation_safe_and_durable_after_wait(
        self, state, tmp_path
    ):
        """submit() snapshots device-side; the caller may immediately
        donate/overwrite the live buffers. After wait() the checkpoint is
        commited on disk and equals the pre-overwrite values."""
        from heuristique_style_transfer_code_tpu.checkpoint.sharded_io import (
            make_async_sharded_writer,
        )

        mesh, variables, opt_state, v_shard, o_shard, opt = state
        # the snapshot copy must preserve the FSDP layout (the assumption
        # the writer's device-side copy rests on)
        snap = jnp.array(variables["conv"]["kernel"], copy=True)
        assert snap.sharding == variables["conv"]["kernel"].sharding

        before = jax.tree_util.tree_map(np.asarray, variables)
        d = str(tmp_path / "ckpt")
        w = make_async_sharded_writer()
        w.submit(variables, d)
        # overwrite the live buffers in place of a donating train step
        bump = jax.jit(
            lambda t: jax.tree_util.tree_map(lambda x: x * 0 - 1.0, t),
            donate_argnums=0,
        )
        variables = bump(variables)
        w.wait()
        assert os.path.exists(os.path.join(d, "MANIFEST.json"))
        back = load_sharded_pytree(d, as_jax=False)
        _tree_equal(back, before)
        w.close()

    def test_worker_error_surfaces_on_wait(self, state, tmp_path):
        from heuristique_style_transfer_code_tpu.checkpoint.sharded_io import (
            make_async_sharded_writer,
        )

        mesh, variables, *_ = state
        w = make_async_sharded_writer()
        # an unwritable target directory fails the worker, not the trainer
        target = str(tmp_path / "f")
        with open(target, "w") as f:
            f.write("x")  # a FILE where the save needs a directory
        w.submit(variables, target)
        with pytest.raises(Exception):
            w.wait()


_TRAIN_WORKER = r'''
import sys

pid, port, mid_dir, fin_dir = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4]
)
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heuristique_style_transfer_code_tpu.checkpoint.sharded_io import (
    save_sharded_pytree,
)

mesh = Mesh(np.asarray(jax.devices()), ("data",))  # 2 procs x 2 = 4 devices
shard_w = NamedSharding(mesh, P("data"))
repl = NamedSharding(mesh, P())
rng = np.random.RandomState(0)
w = jax.device_put(jnp.asarray(rng.randn(8, 3).astype(np.float32)), shard_w)
m = jax.device_put(jnp.zeros((8, 3), jnp.float32), shard_w)
xs = rng.randn(2, 4, 8).astype(np.float32)
ys = rng.randn(2, 4, 3).astype(np.float32)

def train_step(w, m, x, y):
    g = jax.grad(lambda w: jnp.mean((x @ w - y) ** 2))(w)
    m = 0.9 * m + g
    return w - 0.1 * m, m

step = jax.jit(
    train_step,
    in_shardings=(shard_w, shard_w, repl, repl),
    out_shardings=(shard_w, shard_w),
)
w, m = step(w, m, jnp.asarray(xs[0]), jnp.asarray(ys[0]))
save_sharded_pytree({"w": w, "m": m}, mid_dir)   # mid-run elastic handoff
w, m = step(w, m, jnp.asarray(xs[1]), jnp.asarray(ys[1]))
save_sharded_pytree({"w": w, "m": m}, fin_dir)   # uninterrupted endpoint
print(f"proc{pid} ok")
'''


class TestElasticTrainingHandoff:
    def test_two_process_fsdp_train_resumes_single_process(self, tmp_path):
        """REAL 2-process FSDP-style training saves a sharded checkpoint
        mid-run; a plain single-process run (different topology: 1 process
        x 8 virtual devices, 4 used) restores it, continues the step, and
        must land where the uninterrupted 2-process run landed."""
        import socket
        import subprocess
        import sys

        from heuristique_style_transfer_code_tpu.checkpoint.sharded_io import (
            load_sharded_pytree as load,
        )

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        mid, fin = str(tmp_path / "mid"), str(tmp_path / "fin")
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("JAX", "XLA"))}
        env["PYTHONPATH"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _TRAIN_WORKER,
                 str(i), str(port), mid, fin],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]
        logs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            logs.append(out)
        assert all(p.returncode == 0 for p in procs), "\n".join(logs)[-3000:]

        # resume HERE: same 4-wide data sharding, different process topology
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("data",))
        shard_w = NamedSharding(mesh, P("data"))
        state = load(mid, shardings=shard_w)
        rng = np.random.RandomState(0)
        rng.randn(8, 3)  # consume the worker's weight draw
        xs = rng.randn(2, 4, 8).astype(np.float32)
        ys = rng.randn(2, 4, 3).astype(np.float32)

        def train_step(w, m, x, y):
            g = jax.grad(lambda w: jnp.mean((x @ w - y) ** 2))(w)
            m = 0.9 * m + g
            return w - 0.1 * m, m

        step = jax.jit(
            train_step,
            in_shardings=(shard_w, shard_w, None, None),
            out_shardings=(shard_w, shard_w),
        )
        w2, m2 = step(
            state["w"], state["m"], jnp.asarray(xs[1]), jnp.asarray(ys[1])
        )
        final = load(fin, as_jax=False)
        # cross-process Gloo all-reduce vs single-process may reorder the
        # f32 grad reduction: allclose, not bit-equal
        np.testing.assert_allclose(np.asarray(w2), final["w"], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(m2), final["m"], rtol=1e-6, atol=1e-7)


_WORKER = r'''
import sys

pid, port, out_dir = int(sys.argv[1]), sys.argv[2], sys.argv[3]
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.distributed.initialize(f"127.0.0.1:{port}", num_processes=2, process_id=pid)
import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heuristique_style_transfer_code_tpu.checkpoint.sharded_io import (
    load_sharded_pytree, save_sharded_pytree,
)

mesh = Mesh(np.asarray(jax.devices()), ("data",))  # 2 procs x 2 = 4 devices
w_full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
w = jax.device_put(jnp.asarray(w_full), NamedSharding(mesh, P("data")))
b = jax.device_put(jnp.float32(2.5), NamedSharding(mesh, P()))
save_sharded_pytree({"w": w, "b": b}, out_dir)

# reload under a DIFFERENT layout (replicated) and check values on-process
back = load_sharded_pytree(
    out_dir, shardings=NamedSharding(mesh, P())
)
got = np.asarray(jax.device_get(back["w"].addressable_shards[0].data))
np.testing.assert_array_equal(got, w_full)
print(f"proc{pid} ok")
'''


class TestTwoProcessSave:
    def test_each_process_writes_only_its_shards(self, tmp_path):
        """REAL 2-process save: each process's npz holds only its half of
        the sharded leaf; the merged checkpoint loads on a plain
        single-process run (the elastic-restore direction a pod -> one-host
        debug workflow needs)."""
        import socket
        import subprocess
        import sys

        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        out_dir = str(tmp_path / "ckpt")
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("JAX", "XLA"))}
        env["PYTHONPATH"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
        procs = [
            subprocess.Popen(
                [sys.executable, "-c", _WORKER, str(i), str(port), out_dir],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
            for i in range(2)
        ]
        logs = []
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                p.kill()
                out, _ = p.communicate()
            logs.append(out)
        assert all(p.returncode == 0 for p in procs), "\n".join(logs)[-3000:]

        w_full = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        # each process stored exactly its two quarter-shards of w
        for pi in range(2):
            with open(os.path.join(out_dir, f"manifest_p{pi:05d}.json")) as f:
                m = json.load(f)
            w_chunks = m["leaves"]["w"]["chunks"]
            assert len(w_chunks) == 2
            rows = sorted(c["start"][0] for c in w_chunks)
            assert rows == [pi * 4, pi * 4 + 2]
            with np.load(os.path.join(out_dir, m["file"])) as z:
                for c in w_chunks:
                    np.testing.assert_array_equal(
                        z[c["key"]], w_full[c["start"][0]:c["stop"][0]]
                    )
        # scalar b is replicated: stored exactly once across the fleet
        total_b = 0
        for pi in range(2):
            with open(os.path.join(out_dir, f"manifest_p{pi:05d}.json")) as f:
                m = json.load(f)
            if "b" in m["leaves"]:
                total_b += len(m["leaves"]["b"]["chunks"])
        assert total_b == 1

        # and THIS single process can load the 2-process checkpoint
        back = load_sharded_pytree(out_dir, as_jax=False)
        np.testing.assert_array_equal(back["w"], w_full)
        assert float(back["b"]) == 2.5
