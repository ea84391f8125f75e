"""Test config: force CPU backend with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY.md §4 test plan)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Force CPU: the image's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (TPU tunnel), so env vars alone are read too early —
# update the live jax config before any backend initialises. The XLA flag
# set (virtual device count, collective timeouts, single-threaded Eigen on
# oversubscribed hosts) is shared with the driver dryrun — ONE assembly.
from __graft_entry__ import virtual_cpu_xla_flags

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = virtual_cpu_xla_flags(os.environ.get("XLA_FLAGS", ""), 8)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache incl. XLA:CPU *executables* (JAX only caches
# non-CPU backends by default): the 8-virtual-device SPMD programs take
# minutes to compile on a 1-core host (flagship forward measured
# 24.9 s -> 1.5 s warm). Keyed by program+options hash, so always safe.
from heuristique_style_transfer_code_tpu.core.cache import enable_compile_cache

enable_compile_cache(cpu_executables=True)

import numpy as np
import pytest
from PIL import Image


@pytest.fixture(scope="session")
def tiny_imagefolder(tmp_path_factory):
    """Synthetic <root>/{train,test}/<class>/*.png tree, 4 weather classes."""
    root = tmp_path_factory.mktemp("weather")
    rng = np.random.RandomState(0)
    classes = ["fog", "rain", "snow", "sun"]
    for split, n in (("train", 6), ("test", 3)):
        for ci, cls in enumerate(classes):
            d = root / split / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                # class-dependent mean so a model can actually learn
                base = np.full((48, 64, 3), 40 + 50 * ci, dtype=np.float32)
                img = np.clip(base + rng.randn(48, 64, 3) * 20, 0, 255).astype(np.uint8)
                Image.fromarray(img).save(d / f"img_{i:03d}.png")
    return root


@pytest.fixture(scope="module")
def family1(tiny_imagefolder):
    """Tiny family-1 model (cfg, variables, forward_eval), built once per
    module (shared by the tasks / eval-dispatch / GUI-headless suites)."""
    import jax

    from heuristique_style_transfer_code_tpu.config.schema import TruncatedResNetConfig
    from heuristique_style_transfer_code_tpu.train.factories import make_truncated_resnet50

    cfg = TruncatedResNetConfig(batch_size=4, lr=0.01, truncate_layer=5, dim=16)
    variables, _, _, _, forward_eval = make_truncated_resnet50(
        jax.random.PRNGKey(0), cfg, 4, [(None, None)]
    )
    return cfg, variables, forward_eval


@pytest.fixture(scope="session")
def f1_checkpoint(tmp_path_factory):
    """Tiny family-1 checkpoint + config json on disk (shared by the serve
    and recycling CLI suites — read-only)."""
    import json

    import jax

    from heuristique_style_transfer_code_tpu.checkpoint.io import save_pytree_npz
    from heuristique_style_transfer_code_tpu.models.truncated_resnet50 import (
        classifier_init,
        truncated_moco_init,
    )

    d = tmp_path_factory.mktemp("f1ckpt")
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
