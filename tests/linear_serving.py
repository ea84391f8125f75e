"""Shared tiny linear "model" for the serving/deploy suites.

One flat-matmul forward over CROP² RGB crops — fast to jit, exactly
reproducible — used by tests/test_serving.py and tests/test_deploy.py so the
serving submit contract is exercised against a single definition.
"""
import jax.numpy as jnp
import numpy as np

CROP = 32
CLASSES = 4


def linear_variables():
    rng = np.random.RandomState(0)
    return {
        "w": jnp.asarray(rng.randn(CROP * CROP * 3, CLASSES).astype(np.float32) * 0.01),
        "b": jnp.asarray(rng.randn(CLASSES).astype(np.float32)),
    }


def linear_forward(variables, images):
    flat = images.reshape(images.shape[0], -1)
    return flat @ variables["w"] + variables["b"]


def rgb_frames(n, seed=0):
    """List of n random (CROP, CROP, 3) uint8 frames."""
    rng = np.random.RandomState(seed)
    return [rng.randint(0, 256, (CROP, CROP, 3), dtype=np.uint8) for _ in range(n)]


def rgb_batch(n, seed=0):
    """One (n, CROP, CROP, 3) uint8 batch."""
    return np.random.RandomState(seed).randint(
        0, 256, (n, CROP, CROP, 3), dtype=np.uint8
    )
