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


def recycling_builder(argv):
    """In-child builder for the RecyclingServiceProxy tests: the tiny linear
    batcher, constructed inside the spawned worker (tasks/recycling.py).
    argv: optional [max_delay_ms]."""
    from heuristique_style_transfer_code_tpu.tasks.serving import (
        BatchingInferenceServer,
    )

    delay = float(argv[0]) if argv else 5.0
    batcher = BatchingInferenceServer(
        linear_forward, linear_variables(), batch_size=4,
        max_delay_ms=delay, crop=CROP,
    ).start()
    return batcher, {"crop": CROP, "count_key": "images",
                     "class_names": ["a", "b", "c", "d"]}


def style_recycling_builder(argv):
    """In-child builder for the style flavour of the recycling tests: a
    StyleTransferService over an identity job_fn (no encoder — cheap to
    compile in every respawned worker)."""
    import jax.numpy as jnp

    from heuristique_style_transfer_code_tpu.tasks.style_service import (
        StyleTransferService,
    )

    def identity_job(images_u8, style_w, job_ids):
        del style_w, job_ids
        return (
            images_u8,
            jnp.int32(1),
            jnp.zeros((images_u8.shape[0],), jnp.float32),
        )

    service = StyleTransferService(
        job_fn=identity_job, style_names=["mono", "duo"], crop=CROP,
        batch_size=2, max_delay_ms=5.0, num_iterations=1,
    ).start()
    return service, {
        "crop": CROP, "style_names": ["mono", "duo"], "count_key": "jobs",
        "batch_sizes": [2], "num_iterations": 1, "transport": "rgb",
    }


def slow_recycling_builder(argv):
    """In-child builder with an artificially SLOW device path (infer_fn
    sleeps) — exercises the proxy's max_in_worker window under saturation.
    argv: [seconds_per_batch]."""
    import time as _time

    from heuristique_style_transfer_code_tpu.tasks.serving import (
        BatchingInferenceServer,
    )

    delay = float(argv[0]) if argv else 0.05
    variables = linear_variables()

    def slow_infer(v, batch_u8):
        _time.sleep(delay)
        flat = np.asarray(batch_u8, np.float32).reshape(batch_u8.shape[0], -1)
        logits = flat @ np.asarray(variables["w"]) + np.asarray(variables["b"])
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        return e / e.sum(axis=1, keepdims=True)

    batcher = BatchingInferenceServer(
        None, None, batch_size=4, max_delay_ms=5.0, crop=CROP, max_queue=16,
        infer_fn=slow_infer,
    ).start()
    return batcher, {"crop": CROP, "count_key": "images"}


def poison_recycling_builder(argv):
    """In-child builder whose device path KILLS the worker process on the
    first dispatched batch — exercises the proxy's consecutive-crash cap."""
    from heuristique_style_transfer_code_tpu.tasks.serving import (
        BatchingInferenceServer,
    )

    def lethal_infer(v, batch_u8):
        import os as _os

        _os._exit(17)

    batcher = BatchingInferenceServer(
        None, None, batch_size=4, max_delay_ms=5.0, crop=CROP,
        infer_fn=lethal_infer,
    ).start()
    return batcher, {"crop": CROP, "count_key": "images"}
