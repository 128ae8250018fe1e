"""Training loop: optax-based fit over model pytrees.

The functional replacement for the reference's Keras ``compile()/fit()``
workflow (SURVEY.md §1 L5): models are parameter pytrees, the loss is a
callable ``loss_fn(model, batch, key) -> scalar | (scalar, metrics)``,
and one jitted step does grad + update.  Batching is static-shape
(drop-remainder) so the step compiles once.

``data`` may be a single array or any pytree of arrays sharing the
leading (sample) axis — the reference trains BackmappingOnly directly on
a 3-input list (vaemolsim/models.py:510-542, tests/test_models.py:265-308)
and this loop does the same with tuples/dicts.  With ``scan_epochs=True``
the whole epoch (shuffle + every batch step) compiles to ONE jitted
``lax.scan`` with device-resident data — one dispatch per epoch instead
of one per batch, the right shape for TPU at the reference's
100k-sample flow workload (SURVEY.md §6 row 1).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Array = jax.Array

__all__ = ["fit", "fit_ensemble", "make_train_step", "stack_models",
           "unstack_model"]


def stack_models(models: Sequence[Any]) -> Any:
    """Stack K same-structure model pytrees leaf-wise along a new
    leading axis — the input format of :func:`fit_ensemble`."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *models)


def unstack_model(stack: Any, i: int) -> Any:
    """Extract ensemble member ``i`` from a stacked model pytree."""
    return jax.tree_util.tree_map(lambda a: a[i], stack)


def fit_ensemble(model_stack: Any, loss_fn: Callable, data: Any, *,
                 key: Array,
                 num_epochs: int = 1,
                 batch_size: Optional[int] = None,
                 optimizer=None,
                 learning_rate: float = 1e-3,
                 shuffle: bool = True) -> Tuple[Any, Dict[str, Any]]:
    """Train K models SIMULTANEOUSLY via ``vmap`` — deep ensembles /
    multi-seed training as one compiled program (idiomatic on TPU: the
    member axis batches straight onto the hardware; the reference would
    run K sequential Keras fits).

    ``model_stack``: K same-structure models stacked on a new leading
    axis (:func:`stack_models` of per-seed inits).  Every member sees
    the same shuffled batches; members differ by init and by their
    per-member training PRNG streams (split from ``key``).  Returns the
    trained stack and a history whose "loss" entries are per-epoch
    ``(K,)`` arrays.
    """
    if callable(data):
        raise ValueError(
            "fit_ensemble needs in-memory array data (vmapped batches); "
            "materialize the stream or use fit() per member")
    optimizer = optimizer or optax.adam(learning_rate)
    opt_state = jax.vmap(optimizer.init)(model_stack)
    K = jax.tree_util.tree_leaves(model_stack)[0].shape[0]

    n = _num_samples(data)
    batch_size = min(batch_size or n, n)
    n_batches = max(n // batch_size, 1)

    @jax.jit
    def vstep(stack, ostate, batch, keys):
        return jax.vmap(
            lambda m, o, k: _train_step(loss_fn, optimizer, m, o, batch, k),
            in_axes=(0, 0, 0))(stack, ostate, keys)

    key, k_members = jax.random.split(key)
    member_keys = jax.random.split(k_members, K)
    history: Dict[str, Any] = {"loss": [], "epoch_time_s": []}
    for _ in range(num_epochs):
        t0 = time.perf_counter()
        key, k_shuf = jax.random.split(key)
        order = (jax.random.permutation(k_shuf, n) if shuffle
                 else jnp.arange(n))
        epoch_losses = []
        epoch_metrics: Dict[str, list] = {}
        for b in range(n_batches):
            batch = _take(data, order[b * batch_size:(b + 1) * batch_size])
            splits = jax.vmap(jax.random.split)(member_keys)
            member_keys, step_keys = splits[:, 0], splits[:, 1]
            model_stack, opt_state, losses, metrics = vstep(
                model_stack, opt_state, batch, step_keys)
            epoch_losses.append(losses)
            for name, v in metrics.items():
                if name in ("loss", "epoch_time_s"):
                    continue  # reserved history keys
                epoch_metrics.setdefault(name, []).append(v)
        history["loss"].append(
            np.mean(jax.device_get(epoch_losses), axis=0))
        history["epoch_time_s"].append(time.perf_counter() - t0)
        for name, vals in epoch_metrics.items():
            history.setdefault(name, []).append(
                np.mean(jax.device_get(vals), axis=0))
    return model_stack, history


def _mesh_spans_processes(mesh) -> bool:
    pid = jax.process_index()
    return any(d.process_index != pid for d in mesh.devices.flat)


def _leading_axis_sharding(mesh, mesh_axis, ndim):
    """NamedSharding splitting the leading (sample/batch/chain) axis
    over ``mesh_axis`` and replicating the rest — the one data layout
    every fit path (model input placement, per-batch constraint,
    multi-process global view) shares."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = [None] * ndim
    spec[0] = mesh_axis
    return NamedSharding(mesh, P(*spec))


def _put_replicated(x, repl, spans_processes):
    """Replicate a host value over the mesh — multi-process-safe: when
    the mesh spans processes, ``jax.device_put`` cannot target
    non-addressable devices, but every process holds the same host value
    (same seed / same config), so the global replicated array is
    assembled from the process-local copy."""
    x = jnp.asarray(x)
    if spans_processes:
        return jax.make_array_from_process_local_data(repl, np.asarray(x))
    return jax.device_put(x, repl)


def _shard_for_fit(model, opt_state, data, mesh, mesh_axis):
    """Data-parallel placement: model/optimizer replicated, data leaves
    sharded along the sample axis over ``mesh_axis``.  With the loss
    reducing over the batch, XLA inserts the gradient all-reduce (psum
    over ICI) on its own — SPMD, no hand-written collectives."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh_axis not in mesh.axis_names:
        raise ValueError(f"mesh has axes {mesh.axis_names}; expected "
                         f"{mesh_axis!r} (pass mesh_axis=...)")
    n_shards = mesh.shape[mesh_axis]
    repl = NamedSharding(mesh, P())
    spans = _mesh_spans_processes(mesh)  # once, not per model leaf

    def put_data(a):
        a = jnp.asarray(a)
        if a.shape[0] % n_shards:
            raise ValueError(
                f"sample axis ({a.shape[0]}) must divide evenly over the "
                f"{n_shards}-way {mesh_axis!r} mesh axis")
        return jax.device_put(
            a, _leading_axis_sharding(mesh, mesh_axis, a.ndim))

    model = jax.tree_util.tree_map(
        lambda x: _put_replicated(x, repl, spans), model)
    opt_state = jax.tree_util.tree_map(
        lambda x: _put_replicated(x, repl, spans), opt_state)
    if data is not None:
        data = jax.tree_util.tree_map(put_data, data)
    return model, opt_state, data


def make_train_step(loss_fn: Callable, optimizer) -> Callable:
    """Build the jitted (model, opt_state, batch, key) -> ... step."""

    @jax.jit
    def step(model, opt_state, batch, key):
        return _train_step(loss_fn, optimizer, model, opt_state, batch, key)

    return step


def _train_step(loss_fn, optimizer, model, opt_state, batch, key):
    def wrapped(m):
        out = loss_fn(m, batch, key)
        if isinstance(out, tuple):
            return out
        return out, {}

    (loss, metrics), grads = jax.value_and_grad(wrapped, has_aux=True)(model)
    # Pass params: required by optax transforms that use them
    # (adamw / add_decayed_weights / lion), harmless otherwise.
    updates, opt_state = optimizer.update(grads, opt_state, model)
    model = optax.apply_updates(model, updates)
    return model, opt_state, loss, metrics


def _num_samples(data) -> int:
    leaves = jax.tree_util.tree_leaves(data)
    if not leaves:
        raise ValueError("data has no array leaves")
    n = leaves[0].shape[0]
    for leaf in leaves[1:]:
        if leaf.shape[0] != n:
            raise ValueError(
                "all data leaves must share the leading (sample) axis; got "
                f"sizes {sorted({l.shape[0] for l in leaves})}")
    return n


def _take(data, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], data)


def fit(model: Any, loss_fn: Callable, data: Any, *,
        key: Array,
        num_epochs: int = 1,
        batch_size: Optional[int] = None,
        optimizer=None,
        learning_rate: float = 1e-3,
        shuffle: bool = True,
        scan_epochs: bool = False,
        mesh=None,
        mesh_axis: str = "batch",
        process_local_data: bool = False,
        validation_data: Any = None,
        early_stopping_patience: Optional[int] = None,
        min_delta: float = 0.0,
        restore_best: bool = False,
        ema_decay: Optional[float] = None,
        verbose: bool = False) -> Tuple[Any, Dict[str, List[float]]]:
    """Fit ``model`` by minimizing ``loss_fn`` over ``data``.

    ``data`` is an array or a pytree of arrays (tuple / list / dict) with
    a shared leading sample axis; each batch passed to ``loss_fn`` has the
    same structure.  Returns ``(model, history)`` where history maps
    metric names (always including "loss" and "epoch_time_s") to
    per-epoch means — the replacement for Keras' fit history the
    reference relies on.

    ``data`` may instead be a CALLABLE ``data(epoch_key) -> iterator of
    batches`` — an out-of-core stream (compose with
    ``data.epoch_stream`` / ``prefetch_to_device``); ``batch_size`` and
    ``shuffle`` are then the stream's concern and ``scan_epochs`` is
    unavailable (the data never lives in one device array).

    ``mesh``: a ``jax.sharding.Mesh`` for data-parallel training — the
    batch axis is sharded over mesh axis ``mesh_axis`` and the model /
    optimizer state replicated; XLA inserts the gradient all-reduce.
    (The reference has no distributed training at all, SURVEY.md §2.4;
    this is the TPU-native first-class equivalent.)  Batch size must
    divide evenly over the axis.  Results match single-device training
    up to float reduction order.

    ``process_local_data``: multi-process (multi-host) training — every
    process calls ``fit`` with the SAME model/key/hyperparameters but
    passes only ITS shard of the dataset; the shards are assembled into
    globally-sharded arrays (each host feeds its local slice, as on a
    real pod) and training proceeds SPMD over the process-spanning
    ``mesh``.  Requires ``scan_epochs=True`` (the epoch, including the
    global shuffle, must live inside one compiled program — host-side
    gathers cannot touch non-addressable shards).  Initialize the
    runtime first with ``parallel.initialize_distributed()``.

    ``validation_data``: same-structure held-out pytree, evaluated with
    ``loss_fn`` (no gradient, one fixed eval key for comparable epochs)
    after every epoch into ``history["val_loss"]`` — the monitored
    quantity for ``early_stopping_patience`` (stop after N epochs
    without >``min_delta`` improvement; monitors the training loss when
    no validation set is given) and ``restore_best`` (return the
    best-monitored epoch's parameters instead of the last — Keras
    ``EarlyStopping(restore_best_weights=True)`` analog).  Not
    supported with ``process_local_data`` (each host would need the
    full validation set; evaluate after training instead).

    ``ema_decay``: exponential moving average of the parameters,
    ``ema <- d ema + (1 - d) params`` after every optimizer step
    (initialized at the initial params).  The RETURNED model carries
    the averaged weights — the standard deployment weights for
    score/diffusion models and a variance reducer for any SGD
    trajectory; pass ``ema_decay=None`` (default) for raw final
    weights.  Composes with ``restore_best`` (the snapshot taken at
    the best epoch is the EMA state at that epoch).  Validation /
    early stopping monitor the RAW weights' loss (the quantity the
    optimizer actually descends).
    """
    if ema_decay is not None and not (0.0 <= ema_decay < 1.0):
        raise ValueError(f"ema_decay must be in [0, 1); got {ema_decay}")
    optimizer = optimizer or optax.adam(learning_rate)
    opt_state = optimizer.init(model)

    streamed = callable(data)
    if process_local_data:
        if validation_data is not None:
            raise ValueError(
                "validation_data is not supported with process_local_data "
                "(each host holds only its shard); evaluate after training")
        if mesh is None:
            raise ValueError("process_local_data needs a process-spanning "
                             "mesh (parallel.make_mesh after "
                             "initialize_distributed)")
        if streamed:
            raise ValueError("process_local_data takes in-memory local "
                             "shards; wrap streams per-process upstream")
        if not scan_epochs:
            raise ValueError(
                "multi-process fit requires scan_epochs=True: the global "
                "shuffle/gather must run inside the compiled SPMD program "
                "(host-side indexing cannot address remote shards)")
        from vaemolsim_tpu.parallel.distributed import local_to_global

        data = local_to_global(
            data, lambda a: _leading_axis_sharding(
                mesh, mesh_axis, np.asarray(a).ndim))
    if streamed:
        if scan_epochs:
            raise ValueError(
                "scan_epochs needs in-memory array data; streamed data "
                "(callable) trains through the host-driven path")
        n = n_batches = None
    else:
        n = _num_samples(data)
        # Clamp so batch_size > n trains on one full batch in both the
        # host-driven and scanned paths (the scan's reshape needs it
        # exact).
        batch_size = min(batch_size or n, n)
        n_batches = max(n // batch_size, 1)

    batch_sharding = None
    if mesh is not None:
        if mesh_axis not in mesh.axis_names:
            raise ValueError(f"mesh has axes {mesh.axis_names}; expected "
                             f"{mesh_axis!r} (pass mesh_axis=...)")
        if not streamed:
            if batch_size % mesh.shape[mesh_axis]:
                raise ValueError(
                    f"batch_size ({batch_size}) must divide evenly over "
                    f"the {mesh.shape[mesh_axis]}-way {mesh_axis!r} mesh "
                    f"axis")
            # Even sharding needs the SAMPLE axis divisible too; drop the
            # remainder (same drop-remainder semantics batching already
            # has) rather than reject real-world dataset sizes.
            n_keep = n - n % mesh.shape[mesh_axis]
            if n_keep != n:
                if process_local_data:
                    raise ValueError(
                        f"global sample count ({n}) must divide evenly "
                        f"over the {mesh.shape[mesh_axis]}-way "
                        f"{mesh_axis!r} axis in multi-process mode (pad "
                        "or trim the per-process shards)")
                data = jax.tree_util.tree_map(lambda a: a[:n_keep], data)
                n = n_keep
                batch_size = min(batch_size, n)
                n_batches = max(n // batch_size, 1)
        # process_local_data arrays are already globally sharded.
        skip_data = streamed or process_local_data
        model, opt_state, placed = _shard_for_fit(
            model, opt_state, None if skip_data else data, mesh, mesh_axis)
        if not skip_data:
            data = placed

        def batch_sharding(a):
            return _leading_axis_sharding(mesh, mesh_axis, a.ndim)

    eval_step = None
    if validation_data is not None:
        validation_data = jax.tree_util.tree_map(jnp.asarray, validation_data)
        _num_samples(validation_data)  # validate the shared leading axis
        if mesh is not None:
            nv = _num_samples(validation_data)
            nv_keep = nv - nv % mesh.shape[mesh_axis]
            if nv_keep == 0:
                raise ValueError(
                    f"validation_data has {nv} samples, fewer than the "
                    f"{mesh.shape[mesh_axis]}-way {mesh_axis!r} mesh axis "
                    "(an empty trimmed set would make val_loss NaN)")
            if nv_keep != nv:
                validation_data = jax.tree_util.tree_map(
                    lambda a: a[:nv_keep], validation_data)
            validation_data = jax.tree_util.tree_map(
                lambda a: jax.device_put(
                    a, _leading_axis_sharding(mesh, mesh_axis, a.ndim)),
                validation_data)

        @jax.jit
        def eval_step(model, vdata, k):
            out = loss_fn(model, vdata, k)
            return out[0] if isinstance(out, tuple) else out

    # One fixed eval key, split only when a validation set is given so
    # training PRNG streams are unchanged for existing callers; fixed
    # across epochs so val_loss differences reflect the model, not
    # fresh loss noise.
    if eval_step is not None:
        key, k_eval = jax.random.split(key)

    # EMA shadow initialized AFTER sharding so it inherits the model's
    # (possibly replicated) placement.
    ema = model if ema_decay is not None else None
    if ema_decay is not None:

        @jax.jit
        def ema_update(e, m):
            return jax.tree_util.tree_map(
                lambda ev, mv: ema_decay * ev + (1.0 - ema_decay) * mv,
                e, m)

    if scan_epochs:
        data = jax.tree_util.tree_map(jnp.asarray, data)

        @jax.jit
        def run_epoch(model, opt_state, ema, key, data):
            # data rides as an ARGUMENT (not a closure): jit cannot
            # close over multi-process global arrays, and as an argument
            # the donated/committed sharding is honored either way.
            # Same split order as the host-driven path so both modes see
            # identical PRNG streams (tested).
            k_eps, k_shuf = jax.random.split(key)
            order = (jax.random.permutation(k_shuf, n) if shuffle
                     else jnp.arange(n))
            batch_idx = order[: n_batches * batch_size].reshape(
                n_batches, batch_size)

            def body(carry, bidx):
                model, opt_state, ema, k = carry
                k, k_step = jax.random.split(k)
                batch = _take(data, bidx)
                if batch_sharding is not None:
                    # Re-pin the shuffled gather's layout so every batch
                    # is evenly sharded over the data-parallel axis.
                    batch = jax.tree_util.tree_map(
                        lambda a: jax.lax.with_sharding_constraint(
                            a, batch_sharding(a)), batch)
                model, opt_state, loss, metrics = _train_step(
                    loss_fn, optimizer, model, opt_state, batch, k_step)
                if ema_decay is not None:
                    ema = jax.tree_util.tree_map(
                        lambda ev, mv: (ema_decay * ev
                                        + (1.0 - ema_decay) * mv),
                        ema, model)
                return (model, opt_state, ema, k), (loss, metrics)

            (model, opt_state, ema, _), (losses, metrics) = jax.lax.scan(
                body, (model, opt_state, ema, k_eps), batch_idx)
            mean_metrics = jax.tree_util.tree_map(jnp.mean, metrics)
            return model, opt_state, ema, jnp.mean(losses), mean_metrics
    else:
        step = make_train_step(loss_fn, optimizer)

    history: Dict[str, List[float]] = {"loss": [], "epoch_time_s": []}
    monitor = "val_loss" if eval_step is not None else "loss"
    best_monitored = np.inf
    best_model = None
    epochs_without_improvement = 0
    for epoch in range(num_epochs):
        t0 = time.perf_counter()
        key, k_epoch = jax.random.split(key)
        if scan_epochs:
            model, opt_state, ema, mean_loss, mean_metrics = run_epoch(
                model, opt_state, ema, k_epoch, data)
            history["loss"].append(float(mean_loss))
            for name, v in mean_metrics.items():
                if name not in ("loss", "epoch_time_s"):
                    history.setdefault(name, []).append(float(v))
            history["epoch_time_s"].append(time.perf_counter() - t0)
        else:
            key2, k_shuf = jax.random.split(k_epoch)
            if streamed:
                batches = data(k_shuf)
            else:
                order = (jax.random.permutation(k_shuf, n) if shuffle
                         else jnp.arange(n))
                batches = (_take(data,
                                 order[b * batch_size:(b + 1) * batch_size])
                           for b in range(n_batches))
            epoch_metrics: Dict[str, list] = {}
            epoch_loss = []
            for batch in batches:
                if batch_sharding is not None:
                    batch = jax.tree_util.tree_map(
                        lambda a: jax.device_put(a, batch_sharding(a)), batch)
                key2, k_step = jax.random.split(key2)
                model, opt_state, loss, metrics = step(model, opt_state,
                                                       batch, k_step)
                if ema_decay is not None:
                    ema = ema_update(ema, model)
                # Keep device scalars; one host sync per epoch below
                # (per-step float() would serialize JAX's async dispatch).
                epoch_loss.append(loss)
                for name, v in metrics.items():
                    if name in ("loss", "epoch_time_s"):
                        continue  # reserved history keys (e.g. elbo_loss's
                        # own "loss" metric duplicates the total)
                    epoch_metrics.setdefault(name, []).append(v)
            if not epoch_loss:
                raise ValueError("data stream yielded no batches")
            history["loss"].append(float(np.mean(jax.device_get(epoch_loss))))
            history["epoch_time_s"].append(time.perf_counter() - t0)
            for name, vals in epoch_metrics.items():
                history.setdefault(name, []).append(
                    float(np.mean(jax.device_get(vals))))
        if eval_step is not None:
            history.setdefault("val_loss", []).append(
                float(eval_step(model, validation_data, k_eval)))
        if verbose:
            val = (f" val_loss {history['val_loss'][-1]:.4f}"
                   if eval_step is not None else "")
            print(f"epoch {epoch}: loss {history['loss'][-1]:.4f}{val} "
                  f"({history['epoch_time_s'][-1]:.2f}s)")
        monitored = history[monitor][-1]
        if monitored < best_monitored - min_delta:
            best_monitored = monitored
            epochs_without_improvement = 0
            if restore_best:
                # Pytrees of immutable jax arrays: keeping the
                # reference IS a snapshot.
                best_model = model if ema_decay is None else ema
        else:
            epochs_without_improvement += 1
            if (early_stopping_patience is not None
                    and epochs_without_improvement >= early_stopping_patience):
                break
    if ema_decay is not None:
        model = ema
    if restore_best and best_model is not None:
        model = best_model
    return model, history
