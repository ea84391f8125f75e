"""Preemption-safe training: SIGTERM → clean stop → --resume continues
bit-identically (train/preemption.py)."""
import json
import os
import signal
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _dataset(tmp_path, n=6):
    rng = np.random.RandomState(0)
    for cls in ("a", "b"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(n):
            Image.fromarray(
                rng.randint(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(str(d / f"{i}.png"))
    return tmp_path


class TestInProcess:
    def test_flag_preempts_and_resume_matches_straight_run(self, tmp_path):
        """request_preemption() mid-run raises PreemptedError at the next
        batch boundary; rerunning with resume produces results identical to
        an uninterrupted run."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.data.augment import (
            make_augment_fn,
        )
        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.preemption import (
            PreemptedError,
            request_preemption,
        )
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_eval_step,
            make_train_step,
        )

        dataset = ImageFolderIndex(str(_dataset(tmp_path) / "train"))

        def tiny_forward(v, images):
            return images.reshape(images.shape[0], -1) @ v["w"], None

        def init_fn(key, fold):
            k1, _ = jax.random.split(key)
            variables = {
                "w": jax.random.normal(k1, (32 * 32 * 3, 2), jnp.float32) * 0.01
            }
            opt = sgd_momentum(0.05, variables)
            augment = make_augment_fn([(None, None)], crop=32)
            return (
                variables, opt.init(variables),
                make_train_step(tiny_forward, opt, augment),
                make_eval_step(lambda v, x: tiny_forward(v, x)[0], crop=32),
            )

        common = dict(
            k_folds=2, seed=3, epochs=2, batch_size=4,
            hyperparameters={"lr": 0.05}, init_fn=init_fn,
            verbose_batches=False, num_workers=2,
        )

        straight = str(tmp_path / "straight")
        info_a = run_kfold(dataset, save_dir=straight, resume=True, **common)

        pre = str(tmp_path / "pre")
        with pytest.raises(PreemptedError, match="--resume"):
            run_kfold(
                dataset, save_dir=pre, resume=True,
                on_fold_end=lambda *a: request_preemption(),
                **common,
            )
        info_b = run_kfold(dataset, save_dir=pre, resume=True, **common)

        assert info_a["fold_results"] == info_b["fold_results"]
        a = load_pytree_npz(os.path.join(straight, "best_global_model.npz"))
        b = load_pytree_npz(os.path.join(pre, "best_global_model.npz"))
        np.testing.assert_array_equal(np.asarray(a["w"]), np.asarray(b["w"]))

    def test_flag_cleared_at_run_start(self, tmp_path):
        """A stale preemption flag (e.g. left by an earlier preempted run in
        the same process) must not kill a fresh run — including a NON-resume
        run, which writes no checkpoints and must not claim progress was
        checkpointed."""
        from heuristique_style_transfer_code_tpu.data.augment import (
            make_augment_fn,
        )
        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold
        from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
        from heuristique_style_transfer_code_tpu.train.preemption import (
            preemption_requested,
            request_preemption,
        )
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_eval_step,
            make_train_step,
        )

        dataset = ImageFolderIndex(str(_dataset(tmp_path) / "train"))

        def tiny_forward(v, images):
            return images.reshape(images.shape[0], -1) @ v["w"], None

        def init_fn(key, fold):
            k1, _ = jax.random.split(key)
            variables = {
                "w": jax.random.normal(k1, (32 * 32 * 3, 2), jnp.float32) * 0.01
            }
            opt = sgd_momentum(0.05, variables)
            augment = make_augment_fn([(None, None)], crop=32)
            return (
                variables, opt.init(variables),
                make_train_step(tiny_forward, opt, augment),
                make_eval_step(lambda v, x: tiny_forward(v, x)[0], crop=32),
            )

        request_preemption()
        assert preemption_requested()
        info = run_kfold(
            dataset, save_dir=str(tmp_path / "fresh"), resume=False,
            k_folds=2, seed=3, epochs=1, batch_size=4,
            hyperparameters={"lr": 0.05}, init_fn=init_fn,
            verbose_batches=False, num_workers=2,
            # a request arriving MID-run must also be ignored without
            # resume: no checkpoints exist, so PreemptedError's "progress
            # is checkpointed" promise would be false
            on_fold_end=lambda *a: request_preemption(),
        )
        assert len(info["fold_results"]) == 2  # completed, not preempted


class TestRealSignal:
    def test_sigterm_stops_cleanly_and_resume_completes(self, tmp_path):
        """The real contract: SIGTERM to the train CLI process exits 0 with
        the resume hint, state on disk; rerunning with --resume finishes and
        matches an uninterrupted run."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )

        _dataset(tmp_path, n=4)
        cfg = tmp_path / "cfg.json"
        cfg.write_text(json.dumps({
            "batch_size": 4, "lr": 0.01, "truncate_layer": 4,
            "seed": 0, "dim": 8,
        }))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("XLA_FLAGS", None)

        def cli(save_dir, epochs, extra=()):
            return [
                sys.executable,
                os.path.join(REPO, "train_best_RESNET50_Truncate.py"),
                "--data", str(tmp_path), "--config_path", str(cfg),
                "--epochs", str(epochs), "--k_folds", "2",
                "--save_dir", save_dir, "--seed", "0", "--resume", *extra,
            ]

        epochs = 12
        straight = str(tmp_path / "straight")
        subprocess.run(
            cli(straight, epochs), check=True, cwd=REPO, env=env,
            capture_output=True, timeout=900,
        )

        pre = str(tmp_path / "pre")
        proc = subprocess.Popen(
            cli(pre, epochs), cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        state = os.path.join(pre, "_inprogress_state.npz")
        deadline = time.time() + 600
        while time.time() < deadline and proc.poll() is None:
            if os.path.exists(state):
                break
            time.sleep(0.2)
        assert proc.poll() is None, (
            "run finished before the signal could land:\n"
            + proc.communicate()[0]
        )
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=300)
        assert proc.returncode == 0, out
        assert "Preempted:" in out and "--resume" in out, out
        assert os.path.exists(state)

        r = subprocess.run(
            cli(pre, epochs), check=True, cwd=REPO, env=env,
            capture_output=True, text=True, timeout=900,
        )
        assert "Best global model saved" in r.stdout
        a = load_pytree_npz(os.path.join(straight, "best_global_model.npz"))
        b = load_pytree_npz(os.path.join(pre, "best_global_model.npz"))
        flat_a = jax.tree_util.tree_leaves(a)
        flat_b = jax.tree_util.tree_leaves(b)
        for x, y in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
