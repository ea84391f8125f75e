"""Generic QAT fine-tune loop (int8 accuracy recovery, nn/resnet_qat.py).

Short fine-tune of a model THROUGH its fake-quant forward: the weights move
to where the deploy-time int8 rounding stops hurting. BN running stats stay
frozen (stop_gradient in the fold + masked from the optimiser), so the
folded graph the export ships is exactly the graph that was trained.

Usage shape (what the eval CLIs drive via --qat_steps):
    scales = calibrate_activation_scales(encoder, cal_images, truncate)
    variables = qat_finetune(variables, forward_logits, batches, steps, lr)
    q = quantize_resnet50(trained_encoder, scales, truncate)
"""
from __future__ import annotations

from typing import Callable, Iterable, List, Tuple

import jax
import optax

from .optim import sgd_momentum
from .train_loop import masked_cross_entropy


def qat_finetune(
    variables,
    forward_logits: Callable,
    batches: List[Tuple[jax.Array, jax.Array]],
    steps: int,
    lr: float = 1e-4,
    momentum: float = 0.9,
):
    """Run ``steps`` SGD-momentum steps of CE on the fake-quant forward.

    ``forward_logits(variables, images) -> logits``; ``batches`` is a list of
    (normalised f32 NHWC images, int labels) pairs, cycled round-robin (the
    calibration split is small — a handful of batches is the point).
    Returns the fine-tuned variables; one compiled step reused across steps.
    """
    optimizer = sgd_momentum(lr, variables, momentum=momentum)

    @jax.jit
    def step(v, opt_state, images, labels):
        def loss_fn(v):
            return masked_cross_entropy(forward_logits(v, images), labels)

        loss, grads = jax.value_and_grad(loss_fn)(v)
        updates, opt_state = optimizer.update(grads, opt_state, v)
        return optax.apply_updates(v, updates), opt_state, loss

    opt_state = optimizer.init(variables)
    first = last = None
    for i in range(steps):
        images, labels = batches[i % len(batches)]
        variables, opt_state, loss = step(variables, opt_state, images, labels)
        if first is None:
            first = loss
        last = loss
    if first is not None:
        print(
            f"QAT fine-tune: {steps} pas, perte {float(first):.4f} -> "
            f"{float(last):.4f}"
        )
    return variables
