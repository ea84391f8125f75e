"""Serve CLI smoke: checkpoint -> HTTP server -> prediction round trip."""
import http.client
import json

import jax
import numpy as np
import pytest


@pytest.fixture(scope="module")
def f1_checkpoint(tmp_path_factory):
    from heuristique_style_transfer_code_tpu.checkpoint.io import save_pytree_npz
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        classifier_init,
        truncated_moco_init,
    )

    d = tmp_path_factory.mktemp("serve")
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tree = {
        "moco": truncated_moco_init(k1, 5, dim=16),
        "classifier": classifier_init(k2, 16, 4),
    }
    ckpt = str(d / "model.npz")
    save_pytree_npz(tree, ckpt)
    cfg = str(d / "cfg.json")
    with open(cfg, "w") as f:
        json.dump({"batch_size": 4, "lr": 0.01, "truncate_layer": 5,
                   "seed": 0, "dim": 16}, f)
    return cfg, ckpt


def test_serve_cli_round_trip(f1_checkpoint):
    from heuristique_style_transfer_code_tpu.cli.serve import build_parser, start

    cfg, ckpt = f1_checkpoint
    args = build_parser().parse_args([
        "--family", "truncated_resnet50", "--config_path", cfg,
        "--model_path", ckpt, "--port", "0", "--batch_size", "2",
        "--max_delay_ms", "5",
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
