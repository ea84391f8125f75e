"""Test config: force CPU backend with 8 virtual devices so mesh/sharding
tests run without TPU hardware (SURVEY.md §4 test plan)."""
import os

# Force CPU: the image's sitecustomize imports jax at interpreter start with
# JAX_PLATFORMS=axon (TPU tunnel), so env vars alone are read too early —
# update the live jax config before any backend initialises.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_collective_call_terminate_timeout_seconds" not in _flags:
    # XLA-CPU aborts the process when a collective rendezvous takes >40s.
    # On few-core hosts 8 virtual devices serialise their compute, so a
    # legitimate pipeline-parallel step can exceed that between ppermutes.
    _flags += (" --xla_cpu_collective_call_terminate_timeout_seconds=1200"
               " --xla_cpu_collective_timeout_seconds=1200")
if (os.cpu_count() or 1) < 8 and "xla_cpu_multi_thread_eigen" not in _flags:
    # Oversubscribed hosts: Eigen's intra-op pool spins while work-stealing,
    # and with 8 virtual devices it burns ~95% of a 1-core host in
    # tf_XLAEigen threads (measured: flagship pp train step 685 s -> 106 s
    # with single-threaded Eigen). Real multi-core CI keeps the pool.
    _flags += " --xla_cpu_multi_thread_eigen=false"
os.environ["XLA_FLAGS"] = _flags

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
