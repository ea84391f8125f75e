"""Serve CLI smoke: checkpoint -> HTTP server -> prediction round trip."""
import http.client
import json
import os

import jax
import numpy as np
import pytest


def test_build_forward_family2_and_3(tmp_path):
    """The serve CLI must assemble a working eval forward for every family."""
    from heuristique_style_transfer_code_tpu.checkpoint.io import save_pytree_npz
    from heuristique_style_transfer_code_tpu.cli.serve import _build_forward
    from heuristique_style_transfer_code_tpu.models.gram_attention import (
        gram_attention_init,
    )
    from heuristique_style_transfer_code_tpu.models.multi_patchgan import (
        multiscale_init,
    )

    import jax.numpy as jnp

    # family 2
    cfg2 = str(tmp_path / "f2.json")
    with open(cfg2, "w") as f:
        json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                   "gram_matrix_size": 4, "num_classes": 4, "seed": 0}, f)
    ck2 = str(tmp_path / "f2.npz")
    save_pytree_npz(gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4), ck2)
    fwd, variables, _ = _build_forward("gram_attention", cfg2, ck2)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    assert fwd(variables, x).shape == (2, 4)

    # family 3
    cfg3 = str(tmp_path / "f3.json")
    patch_sizes = {"small": 10, "medium": 16, "large": 20}
    with open(cfg3, "w") as f:
        json.dump({"batch_size": 4, "lr": 0.01, "seed": 0, "num_classes": 4,
                   "patch_sizes": patch_sizes, "ndf": 16, "norm": "instance"}, f)
    ck3 = str(tmp_path / "f3.npz")
    save_pytree_npz(
        multiscale_init(jax.random.PRNGKey(1), patch_sizes, ndf=16,
                        num_classes=4, norm="instance"),
        ck3,
    )
    fwd3, v3, _ = _build_forward("multi_patchgan", cfg3, ck3)
    assert fwd3(v3, x).shape == (2, 4)


def test_serve_cli_int8_round_trip(f1_checkpoint, tmp_path):
    from PIL import Image

    from heuristique_style_transfer_code_tpu.cli.serve import build_parser, start

    cfg, ckpt = f1_checkpoint
    rng = np.random.RandomState(1)
    for ci, cls in enumerate(["fog", "rain"]):
        d = tmp_path / "test" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
            ).save(str(d / f"{i}.png"))

    qpath = str(tmp_path / "quantized.npz")

    def predict_once(extra):
        args = build_parser().parse_args([
            "--family", "truncated_resnet50", "--config_path", cfg,
            "--model_path", ckpt, "--port", "0", "--batch_size", "2",
            "--max_delay_ms", "5", "--precision", "int8",
        ] + extra)
        srv, batcher = start(args)
        try:
            host, port = srv.server_address
            conn = http.client.HTTPConnection(host, port, timeout=300)
            frame = np.random.RandomState(2).randint(
                0, 256, (224, 224, 3), dtype=np.uint8
            )
            conn.request(
                "POST", "/predict", body=frame.tobytes(),
                headers={"X-Raw-Shape": "224,224,3"},
            )
            r = conn.getresponse()
            assert r.status == 200
            return json.loads(r.read())
        finally:
            srv.shutdown()
            batcher.stop(drain=True)

    out = predict_once(["--calib_data", str(tmp_path), "--quantized_path", qpath])
    np.testing.assert_allclose(sum(out["probs"]), 1.0, rtol=1e-4)
    assert os.path.exists(qpath)
    # cold start from the persisted tree: no calib_data, identical output
    out2 = predict_once(["--quantized_path", qpath])
    np.testing.assert_allclose(out2["probs"], out["probs"], rtol=1e-5)


def test_serve_cli_round_trip(f1_checkpoint):
    pytest.importorskip("cv2")
    from heuristique_style_transfer_code_tpu.cli.serve import build_parser, start

    cfg, ckpt = f1_checkpoint
    args = build_parser().parse_args([
        "--family", "truncated_resnet50", "--config_path", cfg,
        "--model_path", ckpt, "--port", "0", "--batch_size", "2",
        "--max_delay_ms", "5", "--transport", "yuv420", "--devices", "8",
    ])
    srv, batcher = start(args)
    try:
        host, port = srv.server_address
        conn = http.client.HTTPConnection(host, port, timeout=300)
        frame = np.random.RandomState(0).randint(
            0, 256, (224, 224, 3), dtype=np.uint8
        )
        conn.request(
            "POST", "/predict", body=frame.tobytes(),
            headers={"X-Raw-Shape": "224,224,3"},
        )
        r = conn.getresponse()
        assert r.status == 200
        out = json.loads(r.read())
        assert out["class"] in ["fog", "rain", "snow", "sun"]
        np.testing.assert_allclose(sum(out["probs"]), 1.0, rtol=1e-4)
    finally:
        srv.shutdown()
        batcher.stop(drain=True)


def test_serve_cli_int8_gram_attention(tmp_path):
    """int8 serving for family 2: PTQ encoder + float grams/attention behind
    the HTTP front end."""
    from PIL import Image

    from heuristique_style_transfer_code_tpu.checkpoint.io import save_pytree_npz
    from heuristique_style_transfer_code_tpu.cli.serve import build_parser, start
    from heuristique_style_transfer_code_tpu.models.gram_attention import (
        gram_attention_init,
    )

    cfg = str(tmp_path / "f2.json")
    with open(cfg, "w") as f:
        json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                   "gram_matrix_size": 4, "num_classes": 4, "seed": 0}, f)
    ckpt = str(tmp_path / "f2.npz")
    save_pytree_npz(gram_attention_init(jax.random.PRNGKey(0), 5, 4, 4), ckpt)

    rng = np.random.RandomState(1)
    for cls in ("fog", "rain"):
        d = tmp_path / "test" / cls
        d.mkdir(parents=True)
        for i in range(3):
            Image.fromarray(
                rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
            ).save(str(d / f"{i}.png"))

    qpath = str(tmp_path / "q2.npz")

    def predict_once(extra):
        args = build_parser().parse_args([
            "--family", "gram_attention", "--config_path", cfg,
            "--model_path", ckpt, "--port", "0", "--batch_size", "2",
            "--max_delay_ms", "5", "--precision", "int8",
            "--classes", "fog", "rain", "snow", "sun",
        ] + extra)
        srv, batcher = start(args)
        try:
            host, port = srv.server_address
            conn = http.client.HTTPConnection(host, port, timeout=300)
            frame = np.random.RandomState(2).randint(
                0, 256, (224, 224, 3), dtype=np.uint8
            )
            conn.request(
                "POST", "/predict", body=frame.tobytes(),
                headers={"X-Raw-Shape": "224,224,3"},
            )
            r = conn.getresponse()
            assert r.status == 200
            return json.loads(r.read())
        finally:
            srv.shutdown()
            batcher.stop(drain=True)

    out = predict_once(["--calib_data", str(tmp_path), "--quantized_path", qpath])
    np.testing.assert_allclose(sum(out["probs"]), 1.0, rtol=1e-4)
    assert out["class"] in ["fog", "rain", "snow", "sun"]
    assert os.path.exists(qpath)
    # cold start from the persisted tree (no calib_data): identical output
    out2 = predict_once(["--quantized_path", qpath])
    np.testing.assert_allclose(out2["probs"], out["probs"], rtol=1e-5)


def test_serve_cli_sigterm_drains_and_exits(f1_checkpoint):
    """SIGTERM (orchestrated shutdown) must drain and exit 0, printing the
    stats line — the systemd/k8s stop path."""
    import signal
    import subprocess
    import sys
    import time

    cfg, ckpt = f1_checkpoint
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, "-m", "heuristique_style_transfer_code_tpu.cli.serve",
         "--family", "truncated_resnet50", "--config_path", cfg,
         "--model_path", ckpt, "--port", "0", "--batch_size", "2",
         "--max_delay_ms", "5"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )
    import threading

    captured = []
    ready = threading.Event()

    def _reader():
        for line in proc.stdout:  # drained continuously: no pipe block
            captured.append(line)
            if line.startswith("Serving "):
                ready.set()
        ready.set()  # EOF: unblock the waiter either way

    reader = threading.Thread(target=_reader, daemon=True)
    reader.start()
    try:
        assert ready.wait(timeout=300), "".join(captured)[-2000:]
        assert proc.poll() is None, "".join(captured)[-2000:]
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
        reader.join(timeout=30)
        out = "".join(captured)
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 0, out[-2000:]
    assert "SIGTERM: draining" in out
    assert "Stats:" in out


def test_build_forward_rejects_moco_only_checkpoint(tmp_path):
    """A classifier-less (pretrain-phase) family-1 checkpoint must fail at
    load time with a clear message, not a bare KeyError during jit tracing
    (advisor finding, round 3)."""
    from heuristique_style_transfer_code_tpu.checkpoint.io import save_pytree_npz
    from heuristique_style_transfer_code_tpu.cli.serve import _build_forward
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        truncated_moco_init,
    )

    cfg = str(tmp_path / "cfg.json")
    with open(cfg, "w") as f:
        json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                   "seed": 0, "dim": 16}, f)
    ckpt = str(tmp_path / "moco_only.npz")
    save_pytree_npz(
        {"moco": truncated_moco_init(jax.random.PRNGKey(0), 5, dim=16)}, ckpt
    )
    with pytest.raises(KeyError, match="classifier weights not found"):
        _build_forward("truncated_resnet50", cfg, ckpt)
