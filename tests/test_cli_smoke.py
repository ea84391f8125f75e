"""CLI smoke tests: every entry point end-to-end on the tiny dataset
(SURVEY.md §4 plan (c)). Runs in-process (main(argv)) on the CPU backend."""
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def cfg_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("cfg")

    def write(name, payload):
        p = d / name
        with open(p, "w") as f:
            json.dump(payload, f)
        return str(p)

    return {
        "f1": write("f1.json", {"batch_size": 8, "lr": 0.01, "truncate_layer": 5, "seed": 0, "dim": 16}),
        "f2": write(
            "f2.json",
            {"batch_size": 8, "lr": 0.01, "truncate_layer": 5, "gram_matrix_size": 4,
             "num_classes": 4, "seed": 0},
        ),
        "f3": write(
            "f3.json",
            {"batch_size": 4, "lr": 0.01, "seed": 0, "num_classes": 4,
             "patch_sizes": {"small": 10, "medium": 16, "large": 20},
             "gram_matrix_dim": 16, "ndf": 16, "norm": "instance"},
        ),
    }


@pytest.fixture(scope="module")
def trained_f1(tiny_imagefolder, cfg_file, tmp_path_factory):
    from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

    save_dir = str(tmp_path_factory.mktemp("f1_models"))
    main([
        "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
        "--epochs", "1", "--k_folds", "2", "--save_dir", save_dir, "--seed", "0",
    ])
    return save_dir


class TestTrainCLIs:
    def test_train_truncated_resnet50(self, trained_f1):
        for f in ("training_info.json", "best_model_results.json", "best_global_model.npz"):
            assert os.path.exists(os.path.join(trained_f1, f)), f

    def test_train_f1_freeze_encoder(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path, capsys
    ):
        """--freeze_encoder (reference train_best_RESNET50_Truncate.py:45,
        180): only the classifier trains; the per-fold console messages for
        the frozen encoder AND the matched-classifier checkpoint load."""
        import numpy as np

        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

        ckpt = os.path.join(trained_f1, "best_global_model.npz")
        save_dir = str(tmp_path / "frozen")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", ckpt, "--epochs", "1", "--k_folds", "2",
            "--save_dir", save_dir, "--seed", "0", "--freeze_encoder",
        ])
        outp = capsys.readouterr().out
        assert "Fold 0: Classifier chargé depuis le checkpoint." in outp
        assert ("Fold 0: encodeur gelé (seul le classifieur sera entraîné)."
                in outp)
        before = load_pytree_npz(ckpt)
        after = load_pytree_npz(os.path.join(save_dir, "best_global_model.npz"))
        # stem conv bit-identical (frozen); BN stats may evolve
        np.testing.assert_array_equal(
            before["moco"]["encoder"]["conv1"]["kernel"],
            after["moco"]["encoder"]["conv1"]["kernel"],
        )
        assert not np.array_equal(
            before["classifier"]["fc"]["kernel"],
            after["classifier"]["fc"]["kernel"],
        )

    def test_train_f1_classifier_mismatch_messages(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path, capsys
    ):
        """Reference train_best_RESNET50_Truncate.py:151-177: a checkpoint
        whose classifier fc shape disagrees with the dataset's class count
        keeps the encoder but re-initialises the classifier, with the exact
        per-fold message; a moco-only checkpoint likewise; no checkpoint
        prints the from-scratch line."""
        import numpy as np

        from heuristique_style_transfer_code_tpu.checkpoint.io import (
            load_pytree_npz,
            save_pytree_npz,
        )
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

        tree = load_pytree_npz(os.path.join(trained_f1, "best_global_model.npz"))
        narrow = {
            "moco": tree["moco"],
            "classifier": {"fc": {
                "kernel": np.asarray(tree["classifier"]["fc"]["kernel"])[:, :3],
                "bias": np.asarray(tree["classifier"]["fc"]["bias"])[:3],
            }},
        }
        mism = str(tmp_path / "narrow.npz")
        save_pytree_npz(narrow, mism)
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", mism, "--epochs", "1", "--k_folds", "2",
            "--save_dir", str(tmp_path / "m1"), "--seed", "0",
        ])
        outp = capsys.readouterr().out
        assert ("Fold 0: mismatch classifier → checkpoint a (3, 16), "
                "attendu (4, 16). Nouveau classifieur non chargé." in outp)

        moco_only = str(tmp_path / "moco_only.npz")
        save_pytree_npz({"moco": tree["moco"]}, moco_only)
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", moco_only, "--epochs", "1", "--k_folds", "2",
            "--save_dir", str(tmp_path / "m2"), "--seed", "0",
        ])
        outp = capsys.readouterr().out
        assert ("Fold 0: pas de poids de classifieur dans le checkpoint → "
                "nouveau classifieur." in outp)
        # the encoder DID load: trained artifact starts from the checkpoint
        after = load_pytree_npz(
            os.path.join(str(tmp_path / "m2"), "best_model_fold_0.npz")
        )
        assert after["classifier"]["fc"]["kernel"].shape[-1] == 4

        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--epochs", "1", "--k_folds", "2",
            "--save_dir", str(tmp_path / "m3"), "--seed", "0",
        ])
        outp = capsys.readouterr().out
        assert "Fold 0: pas de checkpoint fourni, entraînement from scratch." in outp

    def test_train_gram_attention_freeze(self, tiny_imagefolder, cfg_file, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.train_gram_attention import main

        save_dir = str(tmp_path / "f2_models")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f2"],
            "--epochs", "1", "--k_folds", "2", "--save_dir", save_dir,
            "--freeze_layers", "--seed", "0",
        ])
        assert os.path.exists(os.path.join(save_dir, "best_global_model.npz"))
        # reference family-2 per-fold artifact surface
        # (train_best_RESNET50_Truncate_gram_attention.py:98-127)
        for k in range(2):
            assert os.path.exists(
                os.path.join(save_dir, f"best_model_fold_{k}.npz")
            )
            with open(os.path.join(save_dir, f"best_performance_fold_{k}.json")) as f:
                perf = json.load(f)
            assert set(perf) == {"accuracy", "precision", "recall", "val_loss"}
            with open(
                os.path.join(save_dir, f"best_hyperparameters_fold_{k}.json")
            ) as f:
                hp = json.load(f)
            assert hp["gram_matrix_size"] == 4
            assert hp["model_path"].endswith(f"best_model_fold_{k}.npz")

    def test_train_parallel_folds_matches_sequential(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """--parallel_folds trains both CV folds as ONE SPMD program over a
        (fold, data) mesh; the per-fold validation results must match the
        sequential run (same args/seed as the trained_f1 fixture)."""
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

        save_dir = str(tmp_path / "f1_parallel")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--epochs", "1", "--k_folds", "2", "--save_dir", save_dir,
            "--seed", "0", "--parallel_folds", "--devices", "8",
        ])
        with open(os.path.join(trained_f1, "training_info.json")) as f:
            seq = json.load(f)
        with open(os.path.join(save_dir, "training_info.json")) as f:
            par = json.load(f)
        assert len(par["fold_results"]) == 2
        for s, p in zip(seq["fold_results"], par["fold_results"]):
            assert p["fold"] == s["fold"]
            for k in ("val_loss", "val_accuracy", "val_f1"):
                np.testing.assert_allclose(p[k], s[k], rtol=1e-4, atol=1e-5)

    def test_train_remat_matches_plain(self, tiny_imagefolder, cfg_file, trained_f1, tmp_path):
        """--remat recomputes block-internal activations in the backward; the
        training trajectory must match the plain run (same args/seed as the
        trained_f1 fixture) to reassociation-level tolerance."""
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

        save_dir = str(tmp_path / "f1_remat")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--epochs", "1", "--k_folds", "2", "--save_dir", save_dir,
            "--seed", "0", "--remat",
        ])
        with open(os.path.join(trained_f1, "training_info.json")) as f:
            plain = json.load(f)
        with open(os.path.join(save_dir, "training_info.json")) as f:
            remat = json.load(f)
        for s, p in zip(plain["fold_results"], remat["fold_results"]):
            for k in ("val_loss", "val_accuracy", "val_f1"):
                np.testing.assert_allclose(p[k], s[k], rtol=1e-4, atol=1e-5)

    def test_parallel_folds_rejects_zero1(self, tiny_imagefolder, cfg_file, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

        with pytest.raises(SystemExit, match="exclusive"):
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
                "--epochs", "1", "--k_folds", "2",
                "--save_dir", str(tmp_path / "x"),
                "--seed", "0", "--parallel_folds", "--zero1",
            ])

    def test_train_multi_patchgan(self, tiny_imagefolder, cfg_file, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.train_multi_patchgan import main

        save_dir = str(tmp_path / "f3_models")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f3"],
            "--epochs", "1", "--k_folds", "2", "--save_dir", save_dir, "--seed", "0",
        ])
        assert os.path.exists(os.path.join(save_dir, "best_global_model.npz"))
        assert os.path.exists(os.path.join(save_dir, "retrained_hyperparameters.json"))
        # reference family-3 artifacts (train_best_Multi_PatchGAN.py:119-130):
        # unconditional per-fold checkpoint + fold-results dump
        for k in range(2):
            assert os.path.exists(os.path.join(save_dir, f"model_fold_{k}.npz"))
        with open(os.path.join(save_dir, "retrained_performance.json")) as f:
            perf = json.load(f)
        assert [p["fold"] for p in perf] == [0, 1]
        assert set(perf[0]) == {
            "fold", "val_loss", "val_accuracy", "val_precision", "val_recall", "val_f1",
        }
        # detected class count overrides the config in the retrained dump
        with open(os.path.join(save_dir, "retrained_hyperparameters.json")) as f:
            assert json.load(f)["num_classes"] == 4


class TestTestCLIs:
    def test_classification_mode(self, tiny_imagefolder, cfg_file, trained_f1, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        out = str(tmp_path / "res")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "classification", "--save_dir", out, "--batch_size", "4",
            "--compute_auc", "--measure_time", "--afficher_params",
        ])
        assert os.path.exists(os.path.join(out, "metrics.txt"))
        assert os.path.exists(os.path.join(out, "confusion_matrix.png"))
        assert os.path.exists(os.path.join(out, "times_test.json"))

    def test_classification_precision_int8(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """--precision int8 (PTQ encoder, calibrated on the --data train
        split by default) must produce the reference artifact surface and near-f32
        metrics on the tiny dataset."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        outs = {}
        for name, extra in (("f32", []), ("int8", ["--precision", "int8"])):
            out = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
                "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
                "--mode", "classification", "--save_dir", out, "--batch_size", "4",
            ] + extra)
            with open(os.path.join(out, "metrics.txt")) as f:
                outs[name] = dict(
                    line.split(":", 1) for line in f.read().splitlines() if ":" in line
                )
        # quantisation noise may flip at most ~one borderline sample on the
        # 12-image set; accuracy is on a 0-100 scale so one flip = 100/12 pts
        acc_a = float(outs["f32"]["Précision du test"])
        acc_b = float(outs["int8"]["Précision du test"])
        assert abs(acc_a - acc_b) <= 100.0 / 12 + 1e-6, (acc_a, acc_b)
        loss_a = float(outs["f32"]["Perte du test"])
        loss_b = float(outs["int8"]["Perte du test"])
        assert abs(loss_a - loss_b) < 0.02

    def test_classification_int8_qat(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path, capsys
    ):
        """--qat_steps N fine-tunes through the fake-quant forward on the
        calibration (train) split before export: runs end to end, prints the
        QAT loss line, and the persisted quantised tree reloads."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        out = str(tmp_path / "qat")
        qpath = str(tmp_path / "qat_encoder.npz")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "classification", "--save_dir", out, "--batch_size", "4",
            "--precision", "int8", "--qat_steps", "4", "--qat_lr", "1e-4",
            "--quantized_path", qpath,
        ])
        captured = capsys.readouterr().out
        assert "QAT fine-tune: 4 pas" in captured
        assert os.path.exists(os.path.join(out, "metrics.txt"))
        assert os.path.exists(qpath)

    def test_camera_mode_video_file(self, tiny_imagefolder, cfg_file, trained_f1, tmp_path):
        """--mode camera with a video-file --camera_index (the documented
        deviation: the reference only accepts device ints) runs headless end
        to end and writes times_camera.json under --measure_time."""
        import cv2

        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        video_path = str(tmp_path / "in.avi")
        w = cv2.VideoWriter(video_path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
        rng = np.random.RandomState(0)
        for _ in range(4):
            w.write(rng.randint(0, 256, (48, 64, 3), dtype=np.uint8))
        w.release()

        out = str(tmp_path / "cam")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "camera", "--camera_index", video_path,
            "--save_dir", out, "--measure_time",
        ])
        with open(os.path.join(out, "times_camera.json")) as f:
            times = json.load(f)
        assert len(times) == 4 and all(t > 0 for t in times)

    def test_classification_int8_quantized_path_roundtrip(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """--quantized_path: run 1 calibrates and persists the quantised
        encoder; run 2 loads it (no calibration) and reproduces the metrics
        exactly."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        qpath = str(tmp_path / "qenc.npz")
        outs = {}
        for name in ("calibrate", "reload"):
            out = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
                "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
                "--mode", "classification", "--save_dir", out, "--batch_size", "4",
                "--precision", "int8", "--quantized_path", qpath,
            ])
            assert os.path.exists(qpath)
            with open(os.path.join(out, "metrics.txt")) as f:
                outs[name] = f.read()
        assert outs["calibrate"] == outs["reload"]

    def test_classification_int8_with_devices_matches_single_device(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """--precision int8 combined with --devices 8: the quantised forward
        under the sharded eval step must reproduce the single-device int8
        predictions exactly."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        outs = {}
        for name, extra in (("one", []), ("mesh8", ["--devices", "8"])):
            out = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
                "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
                "--mode", "classification", "--save_dir", out, "--batch_size", "4",
                "--precision", "int8",
            ] + extra)
            with open(os.path.join(out, "metrics.txt")) as f:
                outs[name] = f.read().splitlines()
        # identical predictions => identical accuracy/precision/recall/F1/matrix
        assert len(outs["one"]) == len(outs["mesh8"])
        for a, b in zip(outs["one"], outs["mesh8"]):
            if a.split(":")[0] in ("Perte du test",):
                continue  # reduction order may differ in the last digits
            assert a == b, (a, b)

    def test_classification_devices_flag_matches_single_device(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """--devices 8 shards the eval batch over the mesh; metrics must be
        identical to the single-device run (VERDICT r1 #3)."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        outs = {}
        for name, extra in (("single", []), ("mesh8", ["--devices", "8"])):
            out = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
                "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
                "--mode", "classification", "--save_dir", out,
                "--batch_size", "4", "--compute_auc",
            ] + extra)
            with open(os.path.join(out, "metrics.txt")) as f:
                outs[name] = f.read().splitlines()
        # loss may differ in the last float digits (XLA reduction order
        # changes under sharding); predictions/metrics must be identical
        for a, b in zip(outs["single"], outs["mesh8"]):
            if ":" in a and a.split(":")[0] in (
                "Perte du test", "Score AUC"
            ):
                key_a, val_a = a.split(":", 1)
                key_b, val_b = b.split(":", 1)
                assert key_a == key_b
                np.testing.assert_allclose(
                    float(val_a), float(val_b), rtol=1e-5
                )
            else:
                assert a == b, (a, b)
        assert len(outs["single"]) == len(outs["mesh8"])

    def test_classification_steps_per_dispatch_matches(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """--steps_per_dispatch 2 scans K eval batches per device dispatch;
        every artifact line must equal the per-batch-dispatch run (the scan
        body is the same program at the same partitioning — bit-exact)."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        outs = {}
        for name, extra in (("k1", []), ("k2", ["--steps_per_dispatch", "2"])):
            out = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
                "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
                "--mode", "classification", "--save_dir", out,
                "--batch_size", "4", "--compute_auc",
            ] + extra)
            with open(os.path.join(out, "metrics.txt")) as f:
                outs[name] = f.read()
        assert outs["k1"] == outs["k2"]

    def test_orbax_checkpoint_train_then_eval(self, tiny_imagefolder, cfg_file, tmp_path):
        """--checkpoint_format orbax checkpoints must load back through the
        eval CLI (directory-type model_path)."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import (
            main as eval_main,
        )
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import (
            main as train_main,
        )

        models = str(tmp_path / "models")
        train_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--epochs", "1", "--k_folds", "2", "--save_dir", models,
            "--seed", "0", "--checkpoint_format", "orbax",
        ])
        ckpt = os.path.join(models, "best_global_model.orbax")
        assert os.path.isdir(ckpt)
        out = str(tmp_path / "res")
        eval_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", ckpt, "--mode", "classification",
            "--save_dir", out, "--batch_size", "4",
        ])
        assert os.path.exists(os.path.join(out, "metrics.txt"))

    def test_tsne_mode_and_embeddings_export(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        out = str(tmp_path / "tsne")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "tsne", "--save_dir", out, "--batch_size", "4",
        ])
        assert os.path.exists(os.path.join(out, "tsne_plot.png"))
        assert os.path.exists(os.path.join(out, "best_global_model_embeddings.json"))
        with open(os.path.join(out, "best_global_model_embeddings.json")) as f:
            data = json.load(f)
        assert len(data["embeddings"]) == 12

    def test_clustering_mode(self, tiny_imagefolder, cfg_file, trained_f1, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        out = str(tmp_path / "clust")
        try:
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
                "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
                "--mode", "clustering", "--save_dir", out, "--clustering_class", "fog",
                "--min_cluster_size", "2", "--min_samples", "1", "--batch_size", "4",
            ])
            assert os.path.exists(os.path.join(out, "fog_clustering_results.json"))
        except ValueError as e:
            # 3 samples may legitimately yield no clusters — the reference
            # raises the same error (test_RESNET50_Truncate.py:202-203)
            assert "No clusters found" in str(e)

    def test_inference_mode_directory(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path, capsys
    ):
        """Reference inference mode (test_RESNET50_Truncate.py:33-164):
        recursive directory gather → inference_predictions.json with the
        exact schema, timing keys under --measure_time, console messages."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        input_dir = str(tiny_imagefolder / "test")
        expected = []
        for root, _, files in os.walk(input_dir):
            expected.extend(
                os.path.join(root, f) for f in files
                if f.lower().endswith((".png", ".jpg", ".jpeg"))
            )
        expected.sort()

        out = str(tmp_path / "inf")
        main([
            "--config_path", cfg_file["f1"],  # --data not required here
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "inference", "--inference_input", input_dir,
            "--save_dir", out, "--batch_size", "4", "--measure_time",
            "--classes", "fog", "rain", "snow", "sun",
        ])
        with open(os.path.join(out, "inference_predictions.json")) as f:
            res = json.load(f)
        assert res["num_images"] == len(expected) > 0
        assert res["classes"] == ["fog", "rain", "snow", "sun"]
        assert [p["image_path"] for p in res["predictions"]] == expected
        for p in res["predictions"]:
            assert p["predicted_class"] == res["classes"][p["predicted_class_index"]]
            probs = p["class_probabilities"]
            assert set(probs) == set(res["classes"])
            assert abs(sum(probs.values()) - 1.0) < 1e-4
            assert abs(p["predicted_probability"] - max(probs.values())) < 1e-9
        assert res["timing"]["total_inference_time_seconds"] > 0
        assert res["timing"]["average_time_per_image_seconds"] > 0
        outp = capsys.readouterr().out
        assert "Résultats d'inférence sauvegardés dans :" in outp
        assert f"Nombre d'images traitées : {len(expected)}" in outp
        assert "Temps total :" in outp

    def test_inference_mode_single_file_and_dispatch(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """Single-file input; --steps_per_dispatch K produces an identical
        JSON; custom --inference_json_name honoured."""
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        one = str(next((tiny_imagefolder / "test" / "fog").glob("*.png")))
        common = [
            "--config_path", cfg_file["f1"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "inference", "--batch_size", "2",
            "--data", str(tiny_imagefolder),  # classes from data/test
        ]
        out1 = str(tmp_path / "a")
        main(common + ["--inference_input", one, "--save_dir", out1,
                       "--inference_json_name", "preds.json"])
        with open(os.path.join(out1, "preds.json")) as f:
            res1 = json.load(f)
        assert res1["num_images"] == 1
        assert res1["predictions"][0]["image_path"] == one

        dirs = str(tiny_imagefolder / "test")
        outs = []
        for k, name in (("1", "k1"), ("3", "k3")):
            out = str(tmp_path / name)
            main(common + ["--inference_input", dirs, "--save_dir", out,
                           "--steps_per_dispatch", k])
            with open(os.path.join(out, "inference_predictions.json")) as f:
                outs.append(json.load(f))
        assert outs[0] == outs[1]  # dispatch granularity is bit-invisible

    def test_inference_mode_errors(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """The reference's exact French error strings."""
        import pytest

        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        base = [
            "--config_path", cfg_file["f1"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "inference", "--save_dir", str(tmp_path / "e"),
        ]
        with pytest.raises(ValueError, match="--inference_input doit être spécifié"):
            main(base)
        bad = tmp_path / "notes.txt"
        bad.write_text("x")
        with pytest.raises(ValueError, match="n'est pas une image supportée"):
            main(base + ["--inference_input", str(bad)])
        with pytest.raises(ValueError, match="Chemin invalide pour l'inférence"):
            main(base + ["--inference_input", str(tmp_path / "missing")])
        empty = tmp_path / "empty"
        empty.mkdir()
        with pytest.raises(ValueError, match="Aucune image trouvée dans"):
            main(base + ["--inference_input", str(empty)])

    def test_gram_attention_classification_and_style_transfer(
        self, tiny_imagefolder, cfg_file, tmp_path
    ):
        from heuristique_style_transfer_code_tpu.cli.train_gram_attention import (
            main as train_main,
        )
        from heuristique_style_transfer_code_tpu.cli.test_gram_attention import (
            main as test_main,
        )

        models = str(tmp_path / "m")
        train_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f2"],
            "--epochs", "1", "--k_folds", "2", "--save_dir", models, "--seed", "0",
        ])
        out = str(tmp_path / "res")
        ckpt = os.path.join(models, "best_global_model.npz")
        test_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f2"],
            "--model_path", ckpt, "--mode", "classification", "--save_dir", out,
            "--compute_auc",
        ])
        with open(os.path.join(out, "classification_results.json")) as f:
            res = json.load(f)
        # reference --compute_auc (test_RESNET50_Truncate_gram_attention.py:
        # 106-117): 'auc' present (None when degenerate), weighted OVR else
        assert "auc" in res
        assert res["auc"] is None or 0.0 <= res["auc"] <= 1.0

        test_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f2"],
            "--model_path", ckpt, "--mode", "style_transfer", "--save_dir", out,
            "--layers", "5", "--num_iterations", "3", "--threshold", "1e-3",
            "--num_samples", "2", "--batch_size", "2",  # additive override
            "--precision", "bf16",  # the shipped fast loop path
        ])
        st_dirs = [d for d in os.listdir(out) if d.startswith("style_transfer_")]
        assert st_dirs

        # big-canvas path: batch over 'data' x canvas H rows over 'spatial'
        # (GSPMD halo exchanges each Adam iteration; equality vs single
        # device is asserted in tests/test_tasks.py — this drives the CLI)
        out_sp = str(tmp_path / "res_sp")
        test_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f2"],
            "--model_path", ckpt, "--mode", "style_transfer",
            "--save_dir", out_sp,
            "--layers", "5", "--num_iterations", "3", "--threshold", "1e-3",
            "--num_samples", "2", "--batch_size", "2",
            "--devices", "4", "--shard_spatial", "2",
        ])
        assert [d for d in os.listdir(out_sp) if d.startswith("style_transfer_")]

        # int8 PTQ path: same artifact, predictions near the f32 run
        out_i8 = str(tmp_path / "res_i8")
        test_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f2"],
            "--model_path", ckpt, "--mode", "classification",
            "--save_dir", out_i8, "--precision", "int8",
        ])
        with open(os.path.join(out, "classification_results.json")) as f:
            ref = json.load(f)
        with open(os.path.join(out_i8, "classification_results.json")) as f:
            got = json.load(f)
        assert abs(float(got["f1_score"]) - float(ref["f1_score"])) <= 0.25

    def test_multi_patchgan_classification(self, tiny_imagefolder, cfg_file, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.train_multi_patchgan import (
            main as train_main,
        )
        from heuristique_style_transfer_code_tpu.cli.test_multi_patchgan import (
            main as test_main,
        )

        models = str(tmp_path / "m")
        train_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f3"],
            "--epochs", "1", "--k_folds", "2", "--save_dir", models, "--seed", "0",
        ])
        out = str(tmp_path / "res")
        # test CLI uses the *test* architecture; train checkpoint loads via
        # shape-filtered update semantics -> here we exercise the native-init
        # path by converting: use the trained ckpt directly (shape mismatch
        # leaves stay at init, matching the reference's partial-load behavior)
        test_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f3"],
            "--model_path", os.path.join(models, "best_global_model.npz"),
            "--mode", "classification", "--save_dir", out, "--num_samples", "4",
            "--compute_auc", "--measure_time",
        ])
        with open(os.path.join(out, "classification_results.json")) as f:
            res = json.load(f)
        assert "auc" in res  # reference test_Multi_PatchGAN.py:218-241
        assert res["auc"] is None or 0.0 <= res["auc"] <= 1.0

        # style transfer, big-canvas sharding: this family optimises ONE
        # image at a time (reference loop), so 'spatial' is the only useful
        # mesh axis — the canvas's H rows split 2-way, GSPMD halos in the
        # discriminator fwd/bwd
        out_sp = str(tmp_path / "res_sp")
        test_main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f3"],
            "--model_path", os.path.join(models, "best_global_model.npz"),
            "--mode", "style_transfer", "--save_dir", out_sp,
            "--num_samples", "1", "--num_iterations", "2",
            "--threshold", "1e-3", "--shard_spatial", "2",
        ])
        assert [d for d in os.listdir(out_sp) if d.startswith("style_transfer_")]


class TestRootWrappers:
    def test_wrappers_importable(self):
        import importlib.util
        import sys

        for name in (
            "train_best_RESNET50_Truncate",
            "test_RESNET50_Truncate",
            "train_best_RESNET50_Truncate_gram_attention",
            "test_RESNET50_Truncate_gram_attention",
            "train_best_Multi_PatchGAN",
            "test_Multi_PatchGAN",
        ):
            path = os.path.join(os.path.dirname(os.path.dirname(__file__)), f"{name}.py")
            spec = importlib.util.spec_from_file_location(f"wrapper_{name}", path)
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            assert callable(mod.main)


class TestGradCAMCLI:
    def test_gradcam_images_written(self, tiny_imagefolder, cfg_file, trained_f1, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        out = str(tmp_path / "gc")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "classification", "--save_dir", out, "--num_samples", "2",
            "--save_test_images", "--visualize_gradcam", "--save_gradcam_images",
            "--colormap", "jet", "--batch_size", "2",
        ])
        import glob

        gradcam_files = glob.glob(os.path.join(out, "GradCAM_*", "*.png"))
        annotated = [
            f for cls in ("fog", "rain", "snow", "sun")
            for f in glob.glob(os.path.join(out, cls, "*.png"))
        ]
        assert len(gradcam_files) == 2
        assert len(annotated) == 2


class TestCrossFamilyCheckpoint:
    def test_family1_ckpt_in_gram_attention_cli(
        self, tiny_imagefolder, cfg_file, trained_f1, tmp_path
    ):
        """A family-1 checkpoint drives the gram-attention CLI: its encoder is
        reused, the head freshly initialised (reference load_model semantics)."""
        from heuristique_style_transfer_code_tpu.cli.test_gram_attention import main

        out = str(tmp_path / "xfam")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f2"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "style_transfer", "--save_dir", out,
            "--layers", "5", "--num_iterations", "2", "--threshold", "1e-3",
            "--num_samples", "2",
        ])
        assert any(d.startswith("style_transfer_") for d in os.listdir(out))


class TestTPUExtras:
    def test_tensorboard_and_devices_flags(self, tiny_imagefolder, cfg_file, tmp_path):
        """--tensorboard writes event files; --devices 4 trains on a 4-way
        data-parallel mesh (8 virtual CPU devices available)."""
        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

        save_dir = str(tmp_path / "tb_models")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--epochs", "1", "--k_folds", "2", "--save_dir", save_dir, "--seed", "0",
            "--tensorboard", "--devices", "4",
        ])
        tb_dir = os.path.join(save_dir, "tensorboard")
        assert os.path.isdir(tb_dir) and os.listdir(tb_dir)
        assert os.path.exists(os.path.join(save_dir, "best_global_model.npz"))

    def test_bf16_precision_flag(self, tiny_imagefolder, cfg_file, trained_f1, tmp_path):
        from heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50 import main

        out = str(tmp_path / "bf16")
        main([
            "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
            "--model_path", os.path.join(trained_f1, "best_global_model.npz"),
            "--mode", "classification", "--save_dir", out, "--batch_size", "4",
            "--precision", "bf16",
        ])
        assert os.path.exists(os.path.join(out, "metrics.txt"))


class TestCombinedFlags:
    def test_train_devices_and_steps_per_dispatch(self, tiny_imagefolder, cfg_file, tmp_path):
        """Data-parallel mesh + K-steps-per-dispatch together: the stacked
        chunk is sharded P(None, 'data') and results match the plain run."""
        import json as _json

        from heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50 import main

        infos = {}
        for name, extra in (
            ("plain", []),
            ("combo", ["--devices", "4", "--steps_per_dispatch", "2"]),
        ):
            out = str(tmp_path / name)
            main([
                "--data", str(tiny_imagefolder), "--config_path", cfg_file["f1"],
                "--epochs", "1", "--k_folds", "2", "--save_dir", out, "--seed", "0",
            ] + extra)
            with open(os.path.join(out, "training_info.json")) as f:
                infos[name] = _json.load(f)["fold_results"]
        for a, b in zip(infos["plain"], infos["combo"]):
            np.testing.assert_allclose(a["val_loss"], b["val_loss"], rtol=1e-4)
            assert a["val_accuracy"] == b["val_accuracy"]


class TestFlagParity:
    """Every flag the reference parsers declare must exist on our CLIs
    (additive extras allowed). Guards the whole argparse surface at once."""

    PAIRS = [
        ("train_best_RESNET50_Truncate.py",
         "heuristique_style_transfer_code_tpu.cli.train_truncated_resnet50"),
        ("train_best_RESNET50_Truncate_gram_attention.py",
         "heuristique_style_transfer_code_tpu.cli.train_gram_attention"),
        ("train_best_Multi_PatchGAN.py",
         "heuristique_style_transfer_code_tpu.cli.train_multi_patchgan"),
        ("test_RESNET50_Truncate.py",
         "heuristique_style_transfer_code_tpu.cli.test_truncated_resnet50"),
        ("test_RESNET50_Truncate_gram_attention.py",
         "heuristique_style_transfer_code_tpu.cli.test_gram_attention"),
        ("test_Multi_PatchGAN.py",
         "heuristique_style_transfer_code_tpu.cli.test_multi_patchgan"),
    ]

    @pytest.mark.parametrize("ref_name,mod_name", PAIRS)
    def test_reference_flags_all_present(self, ref_name, mod_name):
        import importlib
        import re

        ref_path = os.path.join("/root/reference", ref_name)
        if not os.path.exists(ref_path):
            pytest.skip("reference checkout not available")
        src = open(ref_path).read()
        ref_flags = set(re.findall(r"add_argument\(\s*['\"](--[\w-]+)['\"]", src))
        assert ref_flags  # the regex found the parser
        parser = importlib.import_module(mod_name).build_parser()
        ours = set()
        for a in parser._actions:
            ours.update(o for o in a.option_strings if o.startswith("--"))
        assert ref_flags <= ours, f"missing reference flags: {sorted(ref_flags - ours)}"
