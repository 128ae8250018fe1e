"""Training loop: optax-based fit over model pytrees.

The functional replacement for the reference's Keras ``compile()/fit()``
workflow (SURVEY.md §1 L5): models are parameter pytrees, the loss is a
callable ``loss_fn(model, batch, key) -> scalar | (scalar, metrics)``,
and one jitted step does grad + update.  Batching is static-shape
(drop-remainder) so the step compiles once.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array

__all__ = ["fit", "make_train_step"]


def make_train_step(loss_fn: Callable, optimizer) -> Callable:
    """Build the jitted (model, opt_state, batch, key) -> ... step."""

    @jax.jit
    def step(model, opt_state, batch, key):
        def wrapped(m):
            out = loss_fn(m, batch, key)
            if isinstance(out, tuple):
                return out
            return out, {}

        (loss, metrics), grads = jax.value_and_grad(
            wrapped, has_aux=True)(model)
        # Pass params: required by optax transforms that use them
        # (adamw / add_decayed_weights / lion), harmless otherwise.
        updates, opt_state = optimizer.update(grads, opt_state, model)
        model = optax.apply_updates(model, updates)
        return model, opt_state, loss, metrics

    return step


def fit(model: Any, loss_fn: Callable, data: Array, *,
        key: Array,
        num_epochs: int = 1,
        batch_size: Optional[int] = None,
        optimizer=None,
        learning_rate: float = 1e-3,
        shuffle: bool = True,
        verbose: bool = False) -> Tuple[Any, Dict[str, List[float]]]:
    """Fit ``model`` by minimizing ``loss_fn`` over ``data``.

    Returns ``(model, history)`` where history maps metric names (always
    including "loss" and "epoch_time_s") to per-epoch means — the
    replacement for Keras' fit history the reference relies on.
    """
    optimizer = optimizer or optax.adam(learning_rate)
    opt_state = optimizer.init(model)
    step = make_train_step(loss_fn, optimizer)

    n = data.shape[0]
    batch_size = batch_size or n
    n_batches = max(n // batch_size, 1)

    history: Dict[str, List[float]] = {"loss": [], "epoch_time_s": []}
    for epoch in range(num_epochs):
        t0 = time.perf_counter()
        key, k_shuf = jax.random.split(key)
        order = (jax.random.permutation(k_shuf, n) if shuffle
                 else jnp.arange(n))
        epoch_metrics: Dict[str, list] = {}
        epoch_loss = []
        for b in range(n_batches):
            batch = data[order[b * batch_size:(b + 1) * batch_size]]
            key, k_step = jax.random.split(key)
            model, opt_state, loss, metrics = step(model, opt_state, batch,
                                                   k_step)
            # Keep device scalars; one host sync per epoch below (per-step
            # float() would serialize JAX's async dispatch).
            epoch_loss.append(loss)
            for name, v in metrics.items():
                if name in ("loss", "epoch_time_s"):
                    continue  # reserved history keys (e.g. elbo_loss's
                    # own "loss" metric duplicates the total)
                epoch_metrics.setdefault(name, []).append(v)
        history["loss"].append(float(np.mean(jax.device_get(epoch_loss))))
        history["epoch_time_s"].append(time.perf_counter() - t0)
        for name, vals in epoch_metrics.items():
            history.setdefault(name, []).append(
                float(np.mean(jax.device_get(vals))))
        if verbose:
            print(f"epoch {epoch}: loss {history['loss'][-1]:.4f} "
                  f"({history['epoch_time_s'][-1]:.2f}s)")
    return model, history
