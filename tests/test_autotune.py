"""--auto_batch: ahead-of-time HBM autotuning (train/autotune.py).

Under XLA the peak memory of the exact dispatched step is a compile-time
fact (compiled.memory_analysis()) — the probe replaces the reference
workflow of discovering OOM by dying mid-epoch. These tests run on the CPU
backend with explicit budgets."""
import json
import os

import jax
import numpy as np
import pytest

from heuristique_style_transfer_code_tpu.train.autotune import (
    GIB,
    autotune_batch,
    batch_candidates,
    describe_report,
    device_hbm_bytes,
    train_step_peak_bytes,
)


class TestSearchLogic:
    def test_batch_candidates_ladder(self):
        assert batch_candidates(8, 1, 64) == (8, 16, 32, 64)
        # rounded up to mesh multiples, deduplicated
        assert batch_candidates(3, 4, 24) == (4, 8, 12, 24)
        assert batch_candidates(1, 1, 1) == (1,)

    def test_picks_largest_fitting_and_stops_probing(self):
        peaks = {1: 10, 2: 20, 4: 40, 8: 80, 16: 160}
        probed = []

        def measure(b):
            probed.append(b)
            return peaks[b]

        chosen, report = autotune_batch(measure, 50, [1, 2, 4, 8, 16], safety=1.0)
        assert chosen == 4
        # stops at the first over-budget candidate — 16 is never compiled
        assert probed == [1, 2, 4, 8]
        assert report == {1: 10, 2: 20, 4: 40, 8: 80}

    def test_compile_refusal_counts_as_miss(self):
        def measure(b):
            if b >= 8:
                raise RuntimeError("allocation refused")
            return b * 10

        chosen, report = autotune_batch(measure, 1000, [2, 8, 16], safety=1.0)
        assert chosen == 2
        assert report == {2: 20, 8: None}

    def test_none_when_nothing_fits(self):
        chosen, report = autotune_batch(lambda b: 100, 50, [4, 8], safety=1.0)
        assert chosen is None
        assert report == {4: 100}

    def test_describe_report_mentions_every_probe(self):
        text = describe_report({4: int(0.5 * GIB), 8: None}, int(1 * GIB))
        assert "batch 4" in text and "fits" in text
        assert "batch 8" in text and "refused" in text

    def test_device_hbm_none_on_cpu_is_handled(self):
        # XLA:CPU may or may not report a bytes_limit; the contract is just
        # "int or None", both of which the CLI glue handles
        budget = device_hbm_bytes()
        assert budget is None or budget > 0


class TestPeakBytesOnRealStep:
    def test_monotone_in_batch_and_autotune_picks_between(self):
        """Lower the ACTUAL family-1 train step at two batch sizes: peaks
        must be positive and monotone, and a budget between them must make
        autotune choose the smaller batch."""
        from heuristique_style_transfer_code_tpu.config.schema import (
            TruncatedResNetConfig,
        )
        from heuristique_style_transfer_code_tpu.data.loader import STAGING_SIZE
        from heuristique_style_transfer_code_tpu.train.factories import (
            setup_truncated_resnet50,
        )

        cfg = TruncatedResNetConfig.from_dict(
            {"batch_size": 2, "lr": 0.01, "truncate_layer": 5, "seed": 0, "dim": 16}
        )
        setup = setup_truncated_resnet50(cfg, 4, [(None, None)])
        state_shapes = jax.eval_shape(setup.init, jax.random.PRNGKey(0))

        p2 = train_step_peak_bytes(setup.train_step, state_shapes, 2, STAGING_SIZE)
        p4 = train_step_peak_bytes(setup.train_step, state_shapes, 4, STAGING_SIZE)
        assert 0 < p2 < p4

        budget = int((p2 + p4) / 2 / 0.95)
        chosen, report = autotune_batch(
            lambda b: train_step_peak_bytes(
                setup.train_step, state_shapes, b, STAGING_SIZE
            ),
            budget,
            (2, 4),
        )
        assert chosen == 2
        assert set(report) == {2, 4}


class TestAutoBatchCLI:
    def test_train_cli_adopts_probed_batch(
        self, tiny_imagefolder, tmp_path, capsys
    ):
        """--auto_batch end-to-end: compute a budget that fits batch 8 but
        not 16, run the family-1 train CLI with it, and assert the probe
        table is printed and training completes (artifacts on disk)."""
        from heuristique_style_transfer_code_tpu.config.schema import (
            TruncatedResNetConfig,
        )
        from heuristique_style_transfer_code_tpu.data.loader import STAGING_SIZE
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )
        from heuristique_style_transfer_code_tpu.train.factories import (
            setup_truncated_resnet50,
        )

        payload = {
            "batch_size": 4, "lr": 0.01, "truncate_layer": 5, "seed": 0, "dim": 16,
        }
        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump(payload, f)

        # budget between the b8 and b16 peaks of the same step the CLI
        # builds (single-device: --devices 1)
        cfg = TruncatedResNetConfig.from_dict(payload)
        setup = setup_truncated_resnet50(cfg, 4, [(None, None)])
        shapes = jax.eval_shape(setup.init, jax.random.PRNGKey(0))
        p8 = train_step_peak_bytes(setup.train_step, shapes, 8, STAGING_SIZE)
        p16 = train_step_peak_bytes(setup.train_step, shapes, 16, STAGING_SIZE)
        budget_gb = (p8 + p16) / 2 / GIB

        models = str(tmp_path / "m")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_path,
            "--epochs", "1", "--k_folds", "2", "--save_dir", models,
            "--seed", "0", "--devices", "1",
            "--auto_batch", "--hbm_budget_gb", f"{budget_gb:.6f}",
        ])
        out = capsys.readouterr().out
        assert "HBM budget" in out
        assert "adopting batch 8" in out
        assert os.path.exists(os.path.join(models, "best_global_model.npz"))
        # the persisted hyperparameters next to the model carry the ADOPTED
        # batch (what a --model_path reload will see), not the configured one
        with open(
            os.path.join(models, "best_global_model_hyperparameters.json")
        ) as f:
            hp = json.load(f)
        assert hp["batch_size"] == 8

    def test_exclusive_with_grad_accum(self, tiny_imagefolder, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main,
        )

        cfg_path = str(tmp_path / "cfg.json")
        with open(cfg_path, "w") as f:
            json.dump(
                {"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                 "seed": 0, "dim": 16}, f,
            )
        with pytest.raises(SystemExit):
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_path,
                "--epochs", "1", "--k_folds", "2",
                "--save_dir", str(tmp_path / "m"), "--seed", "0",
                "--auto_batch", "--grad_accum", "2",
                "--hbm_budget_gb", "1.0",
            ])
