"""Knob-interaction matrix (round-5): one module asserting BOTH halves of
every documented flag-interaction rule in CLAUDE.md's knob list.

- Exclusive pairs: each advertised-exclusive combination fails CLEANLY
  (SystemExit with the documented message, raised by the validation layer
  in ``cli/_common.py`` / the eval CLIs BEFORE any compile — no traceback).
- Composable pairs: each advertised-composable combination is bit-exact
  against its single-knob baseline at the SAME partitioning (ZeRO-1 is
  pure sharding annotations, remat is pure rematerialisation — neither may
  change a single ulp of the trajectory; CLAUDE.md round-3/4 knob notes).

The reference has no flag interactions to mirror (each CLI's flags are
independent, SURVEY.md §2.3); every rule here governs additive TPU knobs.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.data.augment import make_augment_fn
from heuristique_style_transfer_code_tpu.parallel.sharding import (
    make_mesh_2d,
    zero1_state_shardings,
)
from heuristique_style_transfer_code_tpu.train.optim import sgd_momentum
from heuristique_style_transfer_code_tpu.train.train_loop import (
    make_train_step,
    make_train_step_accum,
)

# ---------------------------------------------------------------------------
# Part A: exclusive pairs fail cleanly (the CLI validation layer)
# ---------------------------------------------------------------------------

EXCLUSIVE_PAIRS = [
    # (extra argv, expected SystemExit message fragment)
    (["--grad_accum", "2", "--steps_per_dispatch", "2"], "exclusive"),
    (["--grad_accum", "2", "--parallel_folds"], "exclusive"),
    (["--auto_batch", "--grad_accum", "2"], "exclusive"),
    (["--auto_batch", "--parallel_folds"], "exclusive"),
    (["--auto_batch", "--lr_schedule", "cosine"], "exclusive"),
    (["--auto_batch", "--warmup_steps", "5"], "exclusive"),
    (["--parallel_folds", "--zero1"], "exclusive"),
    (["--parallel_folds", "--early_stop", "2"], "exclusive"),
    # not a pair but a documented constraint enforced by the same layer
    (["--grad_accum", "3"], "does not divide"),
]


@pytest.fixture(scope="module")
def f1_cfg(tmp_path_factory):
    p = tmp_path_factory.mktemp("knobcfg") / "f1.json"
    with open(p, "w") as f:
        json.dump({"batch_size": 8, "lr": 0.01, "truncate_layer": 5,
                   "seed": 0, "dim": 16}, f)
    return str(p)


class TestExclusivePairs:
    @pytest.mark.parametrize("extra,match", EXCLUSIVE_PAIRS,
                             ids=lambda v: " ".join(v) if isinstance(v, list) else v)
    def test_train_cli_rejects(self, tiny_imagefolder, f1_cfg, tmp_path,
                               extra, match):
        """Every documented-exclusive train-flag pair exits with the
        documented message before any compile (cli/_common.py validation)."""
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )

        with pytest.raises(SystemExit, match=match):
            main([
                "--data", str(tiny_imagefolder), "--config_path", f1_cfg,
                "--epochs", "1", "--k_folds", "2",
                "--save_dir", str(tmp_path / "x"), "--seed", "0", *extra,
            ])

    def test_eval_steps_per_dispatch_rejects_measure_time(
        self, tiny_imagefolder, f1_cfg, family1, tmp_path
    ):
        """Eval --steps_per_dispatch>1 dispatches K batches at once, so the
        per-image timing artifact is meaningless — documented exclusive."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import (
            main,
        )

        _, variables, _ = family1
        model = str(tmp_path / "m.npz")
        save_pytree_npz(variables, model)
        # classification mode validates in tasks/classification.py
        # (ValueError with the documented message); the inference mode's
        # equivalent guard is a SystemExit in the CLI — both clean
        with pytest.raises(ValueError, match="measure_time"):
            main([
                "--data", str(tiny_imagefolder), "--config_path", f1_cfg,
                "--model_path", model, "--mode", "classification",
                "--save_dir", str(tmp_path / "res"), "--batch_size", "4",
                "--steps_per_dispatch", "2", "--measure_time",
            ])


# ---------------------------------------------------------------------------
# Part B: composable pairs are bit-exact vs the single-knob baseline
# ---------------------------------------------------------------------------
#
# Step-level, with the SAME primitives the CLI factories assemble
# (train/factories._setup): sgd_momentum (+ema/schedule/clip) ->
# make_train_step[_accum](mesh=, opt_sharding=, mix_fn=). A linear model
# keeps each step sub-second while still exercising the optimiser-state
# sharding, EMA slots, schedule counters and mixing paths for real.

CROP = 32
BATCH = 8


def _fwd(v, images):
    return images.reshape(images.shape[0], -1) @ v["w"] + v["b"], None


def _variables():
    k = jax.random.PRNGKey(0)
    return {
        "w": jax.random.normal(k, (CROP * CROP * 3, 4), jnp.float32) * 0.01,
        "b": jnp.zeros((4,), jnp.float32),
    }


def _data(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.randint(0, 256, (BATCH, 40, 40, 3), np.uint8))
    labels = jnp.asarray(rng.randint(0, 4, (BATCH,)).astype(np.int32))
    combos = jnp.asarray((np.arange(BATCH) % 2).astype(np.int32))
    return images, labels, combos


def _run(step_builder, opt, n=3):
    """Build a step, run n steps with per-step fold_in keys, return the
    final variables tree (numpy) and per-step losses."""
    augment = make_augment_fn([(None, None), ("horizontal_flip", None)],
                              crop=CROP)
    step = step_builder(opt, augment)
    variables = _variables()
    state = opt.init(variables)
    images, labels, combos = _data()
    losses = []
    for i in range(n):
        key = jax.random.fold_in(jax.random.PRNGKey(42), i)
        variables, state, loss = step(
            variables, state, images, labels, combos, key
        )
        losses.append(float(loss))
    return jax.tree_util.tree_map(np.asarray, variables), losses


def _assert_bit_exact(a, b, context):
    va, la = a
    vb, lb = b
    assert la == lb, (context, la, lb)
    for k in va:
        np.testing.assert_array_equal(va[k], vb[k], err_msg=f"{context}:{k}")


@pytest.fixture(scope="module")
def mesh():
    return make_mesh_2d(8)  # (data=4, model=2) on the 8 virtual devices


def _zero1_pair(mesh, opt, accum=None, mix_fn=None):
    """(baseline_builder, zero1_builder) at the SAME mesh partitioning —
    the only difference is where the optimiser state lives."""
    def base(o, augment):
        if accum:
            return make_train_step_accum(_fwd, o, augment, accum, mesh=mesh,
                                         mix_fn=mix_fn)
        return make_train_step(_fwd, o, augment, mesh=mesh, mix_fn=mix_fn)

    def zero1(o, augment):
        osh = zero1_state_shardings(
            jax.eval_shape(o.init, _variables()), mesh
        )
        if accum:
            return make_train_step_accum(_fwd, o, augment, accum, mesh=mesh,
                                         opt_sharding=osh, mix_fn=mix_fn)
        return make_train_step(_fwd, o, augment, mesh=mesh,
                               opt_sharding=osh, mix_fn=mix_fn)

    return base, zero1


class TestZero1Composes:
    """--zero1 is pure sharding annotations over the optimiser state
    (parallel/sharding.py): composed with any other knob it must reproduce
    that knob's trajectory bit for bit at the same mesh."""

    def test_with_grad_accum(self, mesh):
        """Composes, at f32-reassociation level (NOT bit-exact, measured
        r5): under --grad_accum GSPMD reshards the micro-batch gradient
        accumulation to the ZeRO-1 state layout, reordering the f32 batch
        reduction — first step equal, then ~1e-7 relative drift (same
        class as the documented BN-reduction note in CLAUDE.md). All other
        zero1 compositions below ARE bit-exact."""
        opt = sgd_momentum(0.05, _variables())
        base, z1 = _zero1_pair(mesh, opt, accum=2)
        (va, la), (vb, lb) = _run(base, opt), _run(z1, opt)
        assert la[0] == lb[0]  # divergence only enters via step-1 grads
        np.testing.assert_allclose(la, lb, rtol=1e-4, atol=1e-7)
        for k in va:
            np.testing.assert_allclose(va[k], vb[k], rtol=1e-5, atol=1e-7,
                                       err_msg=f"zero1+accum:{k}")

    def test_with_ema(self, mesh):
        opt = sgd_momentum(0.05, _variables(), ema_decay=0.9)
        base, z1 = _zero1_pair(mesh, opt)
        a, b = _run(base, opt), _run(z1, opt)
        _assert_bit_exact(a, b, "zero1+ema")

    def test_with_mixup(self, mesh):
        from heuristique_style_transfer_code_tpu.train.mixing import (
            make_mix_fn,
        )

        opt = sgd_momentum(0.05, _variables())
        base, z1 = _zero1_pair(mesh, opt, mix_fn=make_mix_fn(mixup_alpha=0.4))
        _assert_bit_exact(_run(base, opt), _run(z1, opt), "zero1+mixup")

    def test_with_schedule_and_clip(self, mesh):
        from heuristique_style_transfer_code_tpu.train.schedules import (
            make_lr_schedule,
        )

        sched = make_lr_schedule("cosine", 0.05, 3, 1, 0.1)
        opt = sgd_momentum(sched, _variables(), clip_norm=1.0)
        base, z1 = _zero1_pair(mesh, opt)
        _assert_bit_exact(_run(base, opt), _run(z1, opt), "zero1+schedule")


class TestRematComposes:
    def test_remat_with_accum(self, mesh):
        """--remat (jax.checkpoint around the forward) composed with
        --grad_accum must equal plain accumulation exactly: recomputation
        re-runs the identical ops."""
        fwd_remat = jax.checkpoint(_fwd)
        opt = sgd_momentum(0.05, _variables())

        def base(o, augment):
            return make_train_step_accum(_fwd, o, augment, 2, mesh=mesh)

        def remat(o, augment):
            return make_train_step_accum(fwd_remat, o, augment, 2, mesh=mesh)

        _assert_bit_exact(_run(base, opt), _run(remat, opt), "remat+accum")


class TestEarlyStopEmaResumeCompose:
    def test_interrupted_resume_matches_straight_run(self, tmp_path):
        """--early_stop × --ema_decay × --resume: the early-stop counters,
        the best-EMA snapshot and the optimiser's EMA slots all ride the
        in-progress checkpoint — an interrupted+resumed run must equal the
        uninterrupted one bit for bit (extends
        test_early_stop.TestEarlyStopKFold::test_resume_bit_identical_with_early_stop
        with the EMA knob on, per the r4 verdict's composability matrix)."""
        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.data.imagefolder import (
            ImageFolderIndex,
        )
        from heuristique_style_transfer_code_tpu.train.kfold import run_kfold
        from heuristique_style_transfer_code_tpu.train.optim import (
            extract_ema_variables,
        )
        from heuristique_style_transfer_code_tpu.train.train_loop import (
            make_eval_step,
        )
        from PIL import Image

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

        def init_fn(key, fold):
            variables = {
                "w": jax.random.normal(key, (CROP * CROP * 3, 2),
                                       jnp.float32) * 0.01,
                "b": jnp.zeros((2,), jnp.float32),
            }
            opt = sgd_momentum(0.05, variables, ema_decay=0.8)
            augment = make_augment_fn([(None, None)], crop=CROP)
            fwd2 = lambda v, im: (  # noqa: E731
                im.reshape(im.shape[0], -1) @ v["w"] + v["b"], v
            )
            return (
                variables,
                opt.init(variables),
                make_train_step(fwd2, opt, augment),
                make_eval_step(lambda v, x: fwd2(v, x)[0], crop=CROP),
            )

        common = dict(
            k_folds=2, seed=7, epochs=4, batch_size=4,
            hyperparameters={"lr": 0.05}, init_fn=init_fn,
            verbose_batches=False, num_workers=2, early_stop=2, resume=True,
            eval_variables_fn=extract_ema_variables,
        )
        straight = str(tmp_path / "straight")
        info_a = run_kfold(dataset, save_dir=straight, **common)
        resumed = str(tmp_path / "resumed")
        with pytest.raises(RuntimeError, match="test seam"):
            run_kfold(dataset, save_dir=resumed, _interrupt_after=(0, 1),
                      **common)
        info_b = run_kfold(dataset, save_dir=resumed, **common)

        assert info_a["fold_results"] == info_b["fold_results"]
        a = load_pytree_npz(os.path.join(straight, "best_global_model.npz"))
        b = load_pytree_npz(os.path.join(resumed, "best_global_model.npz"))
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
