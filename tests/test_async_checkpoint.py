"""Async checkpoint writer: identical files, donation safety, and the
elastic-resume protocol running with the background writer."""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.checkpoint.async_io import (
    AsyncCheckpointWriter,
)
from heuristique_style_transfer_code_tpu.checkpoint.io import (
    load_pytree_npz,
    save_pytree_npz,
)


def _tree(seed=0):
    k = jax.random.PRNGKey(seed)
    return {
        "w": jax.random.normal(k, (8, 4), jnp.float32),
        "stats": {"count": np.int64(3), "none": None},
        "leaves": [jnp.arange(5), np.float32(1.5)],
    }


def _assert_tree_equal(a, b):
    jax.tree_util.tree_map(
        lambda x, y: np.testing.assert_array_equal(np.asarray(x), np.asarray(y)),
        a, b,
    )


class TestWriter:
    def test_identical_to_sync_save(self, tmp_path):
        tree = _tree()
        sync_p = str(tmp_path / "sync.npz")
        async_p = str(tmp_path / "async.npz")
        save_pytree_npz(tree, sync_p)
        with AsyncCheckpointWriter() as w:
            w.submit(tree, async_p)
        _assert_tree_equal(load_pytree_npz(sync_p), load_pytree_npz(async_p))

    def test_snapshot_survives_donation(self, tmp_path):
        """The device buffers may be donated to the very next step: the
        pending write must hold the values AT SUBMIT TIME."""
        x = jnp.arange(16, dtype=jnp.float32)
        expected = np.asarray(x).copy()
        path = str(tmp_path / "snap.npz")
        w = AsyncCheckpointWriter()
        w.submit({"x": x}, path)

        clobber = jax.jit(lambda v: v * 0.0 - 7.0, donate_argnums=0)
        x = clobber(x)  # donates the original buffer
        np.asarray(x)  # force it
        w.close()
        np.testing.assert_array_equal(
            np.asarray(load_pytree_npz(path)["x"]), expected
        )

    def test_last_write_wins_fifo(self, tmp_path):
        path = str(tmp_path / "seq.npz")
        with AsyncCheckpointWriter() as w:
            for i in range(5):
                w.submit({"i": jnp.full((3,), i)}, path)
        np.testing.assert_array_equal(
            np.asarray(load_pytree_npz(path)["i"]), np.full((3,), 4.0)
        )

    def test_worker_error_surfaces_on_wait(self, tmp_path):
        blocker = tmp_path / "not_a_dir"
        blocker.write_text("file, not directory")
        w = AsyncCheckpointWriter()
        w.submit({"x": jnp.zeros(2)}, str(blocker / "ckpt.npz"))
        with pytest.raises(Exception):
            w.wait()
        # the writer stays usable after a surfaced error
        ok = str(tmp_path / "ok.npz")
        w.submit({"x": jnp.ones(2)}, ok)
        w.close()
        assert os.path.exists(ok)

    def test_submit_after_close_rejected(self, tmp_path):
        w = AsyncCheckpointWriter()
        w.close()
        with pytest.raises(RuntimeError, match="closed"):
            w.submit({"x": jnp.zeros(1)}, str(tmp_path / "x.npz"))

    def test_wait_after_close_returns(self, tmp_path):
        """wait() after close() must not deadlock on the shutdown sentinel
        (the worker balances it with task_done)."""
        import threading

        w = AsyncCheckpointWriter()
        w.submit({"x": jnp.zeros(1)}, str(tmp_path / "x.npz"))
        w.close()
        t = threading.Thread(target=w.wait, daemon=True)
        t.start()
        t.join(timeout=30)
        assert not t.is_alive()


class TestAsyncResume:
    def test_interrupt_and_resume_bit_identical_async(self, tmp_path):
        """The elastic-resume protocol with --async_checkpoint: interrupted
        + resumed equals an uninterrupted SYNC run bit-for-bit (files and
        numerics unchanged by the background writer)."""
        from PIL import Image

        from heuristique_style_transfer_code_tpu.data.augment import (
            make_augment_fn,
        )
        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_eval_step,
            make_train_step,
        )

        rng = np.random.RandomState(0)
        root = tmp_path / "data" / "train"
        for cls in ("a", "b"):
            d = root / cls
            d.mkdir(parents=True)
            for i in range(6):
                Image.fromarray(
                    rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
                ).save(str(d / f"{i}.png"))
        dataset = ImageFolderIndex(str(root))

        def tiny_forward(v, images):
            flat = images.reshape(images.shape[0], -1)
            return flat @ v["w"] + v["b"], v

        def init_fn(key, fold):
            k1, _ = jax.random.split(key)
            dim = 32 * 32 * 3
            variables = {
                "w": jax.random.normal(k1, (dim, 2), jnp.float32) * 0.01,
                "b": jnp.zeros((2,), jnp.float32),
            }
            opt = sgd_momentum(0.05, variables)
            augment = make_augment_fn([(None, None)], crop=32)
            return (
                variables,
                opt.init(variables),
                make_train_step(tiny_forward, opt, augment),
                make_eval_step(lambda v, x: tiny_forward(v, x)[0], crop=32),
            )

        common = dict(
            k_folds=2, seed=7, epochs=3, batch_size=4,
            hyperparameters={"lr": 0.05}, init_fn=init_fn,
            verbose_batches=False, num_workers=2,
        )

        sync_dir = str(tmp_path / "sync")
        info_a = run_kfold(dataset, save_dir=sync_dir, resume=True, **common)

        adir = str(tmp_path / "async")
        with pytest.raises(RuntimeError, match="test seam"):
            run_kfold(
                dataset, save_dir=adir, resume=True, async_checkpoint=True,
                _interrupt_after=(1, 1), **common,
            )
        # the seam waited on the writer: the checkpoint is durable
        assert os.path.exists(os.path.join(adir, "_inprogress_state.npz"))
        info_b = run_kfold(
            dataset, save_dir=adir, resume=True, async_checkpoint=True,
            **common,
        )

        assert info_a["fold_results"] == info_b["fold_results"]
        a = load_pytree_npz(os.path.join(sync_dir, "best_global_model.npz"))
        b = load_pytree_npz(os.path.join(adir, "best_global_model.npz"))
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        # writer drained before cleanup: no resurrected in-progress files
        assert not os.path.exists(os.path.join(adir, "_inprogress_state.npz"))
        assert not os.path.exists(os.path.join(adir, "_inprogress_meta.json"))
        with open(os.path.join(adir, "training_info.json")) as f:
            json.load(f)  # valid artifact
