"""jit/pjit train & eval step builders.

Replaces the reference's Lightning hot loop (base_experiment.py:109-126,
including the per-batch gc.collect() throughput killer, SURVEY.md §2.4(11))
with a single fully-jitted SPMD step: forward + 8-term loss + grad +
optimizer update compile to one XLA program; batch sharded over 'data',
gradient all-reduce inserted by XLA over ICI.
"""

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from scae_tpu.parallel.mesh import batch_sharding, param_shardings


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array

    def replace_(self, **kw):
        return self.replace(**kw)


def create_train_state(model, tx: optax.GradientTransformation,
                       example_batch, init_rng: jax.Array) -> TrainState:
    """Initialize params (torch-default init distributions) + opt state.

    Init is wrapped in jit: flax's eager init would otherwise dispatch
    every primitive in the forward pass as its own tiny program — painful
    over a remote-TPU link where each dispatch is an RPC round trip.
    """
    params_rng, noise_rng, state_rng = jax.random.split(init_rng, 3)

    @jax.jit
    def init_all(rngs, image):
        variables = model.init(rngs, image, deterministic=False)
        params = variables["params"]
        return params, tx.init(params)

    params, opt_state = init_all(
        {"params": params_rng, "noise": noise_rng}, example_batch["image"])
    return TrainState(
        step=jnp.zeros([], jnp.int32),
        params=params,
        opt_state=opt_state,
        rng=state_rng,
    )


def loss_fn(model, params, batch, rng, deterministic: bool):
    res = model.apply(
        {"params": params}, batch["image"], deterministic=deterministic,
        rngs=None if deterministic else {"noise": rng})
    loss, log = model.loss(res, batch["image"], batch.get("label"))
    return loss, log


def make_train_step(model, tx: optax.GradientTransformation,
                    mesh=None, donate: bool = True) -> Callable:
    """Build the jitted SPMD training step: (state, batch) -> (state, metrics)."""

    def train_step(state: TrainState, batch):
        step_rng = jax.random.fold_in(state.rng, state.step)

        def lf(params):
            return loss_fn(model, params, batch, step_rng,
                           deterministic=False)

        (loss, log), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(log)
        metrics["loss"] = loss
        new_state = state.replace(step=state.step + 1, params=params,
                                  opt_state=opt_state)
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    bsh = batch_sharding(mesh)  # pytree prefix: applies to every batch leaf
    return jax.jit(
        train_step,
        in_shardings=(None, bsh),
        donate_argnums=(0,) if donate else (),
    )


def decode_images(images: jax.Array) -> jax.Array:
    """uint8 -> f32 [0,1] and HWC -> CHW, batch-leading. Elementwise, so
    XLA fuses it into the first consumer wherever it is called."""
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    if images.ndim == 3:
        images = images[:, None]             # (B, 1, H, W)
    elif images.shape[-1] in (1, 3, 4):      # (B, H, W, C) -> NCHW
        images = jnp.transpose(images, (0, 3, 1, 2))
    return images


def make_raw_train_step(model, tx: optax.GradientTransformation,
                        augment_fn=None) -> Callable:
    """Training step on an already-gathered RAW batch:
    (state, images, labels) -> (state, metrics), images uint8/float in
    storage layout. The gather lives OUTSIDE so scan wrappers can hoist
    it: gathering inside a scan body makes XLA re-layout the full
    dataset every iteration (measured: a u8[N,28,28] layout copy per
    step on the TPU trace), while one chunk-level 2-D take runs once
    per dispatch.
    """

    def step(state: TrainState, images, labels):
        batch = {"image": decode_images(images), "label": labels}

        if augment_fn is not None:
            aug_rng = jax.random.fold_in(
                jax.random.fold_in(state.rng, state.step), 7)
            batch = augment_fn(batch, aug_rng)

        step_rng = jax.random.fold_in(state.rng, state.step)

        def lf(params):
            res = model.apply({"params": params}, batch["image"],
                              deterministic=False,
                              rngs={"noise": step_rng})
            loss, log = model.loss(res, batch["image"], batch["label"])
            if model.n_classes and batch.get("label") is not None:
                # train accuracy per step, as the reference harness logs
                # (base_experiment.py:109-126); stop_gradient'd probs
                log = dict(log, accuracy=model.calculate_accuracy(
                    res, batch["label"]))
            return loss, log

        (loss, log), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(log)
        metrics["loss"] = loss
        return state.replace(step=state.step + 1, params=params,
                             opt_state=opt_state), metrics

    return step


def make_fused_train_step(model, tx: optax.GradientTransformation,
                          augment_fn=None) -> Callable:
    """The whole training step as one pure function, designed for
    device-resident data: (state, data, idx) -> (state, metrics).

    data: {'image': (N, ...) uint8 or float, 'label': (N,)} living on
    device; idx: (B,) int32 batch indices. The step gathers the batch,
    decodes uint8 -> f32, applies augment_fn(batch, rng), runs forward +
    loss + grad + optimizer. Only the tiny idx vector crosses the host
    boundary per step.
    """
    raw_step = make_raw_train_step(model, tx, augment_fn)

    def step(state: TrainState, data, idx):
        return raw_step(state,
                        jnp.take(data["image"], idx, axis=0),
                        jnp.take(data["label"], idx, axis=0))

    return step


def make_train_scan(model, tx: optax.GradientTransformation,
                    augment_fn=None, mesh=None,
                    donate: bool = True) -> Callable:
    """K fused steps per dispatch via lax.scan: (state, data, idxs) ->
    (state, metrics) with idxs (K, B) and metrics leaves (K,).

    One XLA program per K steps — the host only syncs once per chunk,
    which amortizes dispatch latency (decisive over a remote-TPU link,
    still a win on a local host).

    The batch gather is hoisted OUT of the scan body: one 2-D take
    produces the chunk's (K, B, ...) raw batches up front. Gathering
    inside the body made XLA re-layout the entire dataset every
    iteration (a u8[N, H, W] "data formatting" copy per step on the
    TPU trace — ~30 us/step at N=1024 and growing linearly with N).
    Values are identical; only where the gather runs changes. Under a
    mesh the 2-D take keeps sharding propagation trivial:
    idxs P(None, 'data') -> batches P(None, 'data', ...).
    """
    raw_step = make_raw_train_step(model, tx, augment_fn)

    def scan_steps(state: TrainState, data, idxs):
        images = jnp.take(data["image"], idxs, axis=0)   # (K, B, ...)
        labels = jnp.take(data["label"], idxs, axis=0)   # (K, B)

        def body(carry, xs):
            new_state, metrics = raw_step(carry, xs["image"], xs["label"])
            return new_state, metrics

        state, metrics = jax.lax.scan(
            body, state, {"image": images, "label": labels})
        return state, metrics

    kwargs = {"donate_argnums": (0,) if donate else ()}
    if mesh is not None:
        bsh = batch_sharding(mesh)
        # idxs (K, B): shard the batch axis (axis 1) over 'data'
        from jax.sharding import NamedSharding, PartitionSpec as P

        idx_sh = NamedSharding(mesh, P(None, "data"))
        kwargs["in_shardings"] = (None, None, idx_sh)
        del bsh
    return jax.jit(scan_steps, **kwargs)


def make_raw_eval_step(model, canvas: int = 0) -> Callable:
    """Eval step on an already-gathered raw batch:
    (params, images, labels) -> metrics. See make_raw_train_step for
    why the gather lives outside."""
    from scae_tpu.train.data import pad_to_canvas

    def eval_step(params, images, labels):
        images = decode_images(images)
        if canvas and images.shape[-1] != canvas:
            images = pad_to_canvas(images, canvas)
        batch = {"image": images, "label": labels}
        res = model.apply({"params": params}, batch["image"],
                          deterministic=True)
        loss, log = model.loss(res, batch["image"], batch["label"])
        metrics = dict(log)
        metrics["loss"] = loss
        if model.n_classes:
            metrics["accuracy"] = model.calculate_accuracy(
                res, batch["label"])
        return metrics

    return eval_step


def make_fused_eval_step(model, canvas: int = 0, mesh=None) -> Callable:
    """Eval twin of make_fused_train_step, multi-host ready:
    (params, data, idx) -> metrics.

    data: the full eval split as (globally replicated) device arrays;
    idx: (B,) int32 batch indices sharded over 'data'. The step gathers
    the batch, decodes uint8 -> f32, center-pads to `canvas`, and
    computes the loss terms — so eval feeds the same way as training
    and works unchanged under a multi-process mesh (the host never
    builds a per-batch array, only the tiny index vector).
    """
    raw_step = make_raw_eval_step(model, canvas=canvas)

    def eval_step(params, data, idx):
        return raw_step(params,
                        jnp.take(data["image"], idx, axis=0),
                        jnp.take(data["label"], idx, axis=0))

    if mesh is None:
        return jax.jit(eval_step)
    from jax.sharding import NamedSharding, PartitionSpec as P

    idx_sh = NamedSharding(mesh, P("data"))
    return jax.jit(eval_step, in_shardings=(None, None, idx_sh))


def make_eval_scan(model, canvas: int = 0, mesh=None) -> Callable:
    """Whole-eval-pass twin of make_train_scan: (params, data, idxs) ->
    metrics with idxs (K, B) and metrics leaves (K,).

    One XLA program (and ONE host dispatch) per eval pass instead of K —
    over a tunneled TPU link the per-dispatch round trip dominates an
    eval batch's ~2 ms of compute, so this turns a multi-second eval
    into one round trip. Batch gather hoisted out of the scan body as
    in make_train_scan.
    """
    raw_step = make_raw_eval_step(model, canvas=canvas)

    def scan_eval(params, data, idxs):
        images = jnp.take(data["image"], idxs, axis=0)
        labels = jnp.take(data["label"], idxs, axis=0)

        def body(carry, xs):
            return carry, raw_step(params, xs["image"], xs["label"])

        _, metrics = jax.lax.scan(
            body, None, {"image": images, "label": labels})
        return metrics

    kwargs = {}
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        idx_sh = NamedSharding(mesh, P(None, "data"))
        kwargs["in_shardings"] = (None, None, idx_sh)
    return jax.jit(scan_eval, **kwargs)


def make_eval_step(model, mesh=None) -> Callable:
    """Jitted eval step: (params, batch) -> metrics (loss terms + accuracy)."""

    def eval_step(params, batch):
        res = model.apply({"params": params}, batch["image"],
                          deterministic=True)
        loss, log = model.loss(res, batch["image"], batch.get("label"))
        metrics = dict(log)
        metrics["loss"] = loss
        if batch.get("label") is not None and model.n_classes:
            metrics["accuracy"] = model.calculate_accuracy(
                res, batch["label"])
        return metrics

    if mesh is None:
        return jax.jit(eval_step)
    bsh = batch_sharding(mesh)
    return jax.jit(eval_step, in_shardings=(None, bsh))


def shard_state(state: TrainState, mesh, model_axis: bool = True):
    """Place a TrainState onto the mesh: capsule banks over 'model',
    everything else replicated (optimizer moments cheap at this scale)."""
    from scae_tpu.parallel.mesh import replicate_sharding
    p_sh = param_shardings(mesh, state.params,
                           shard_capsule_banks=model_axis)
    rep = replicate_sharding(mesh)
    return state.replace(
        params=jax.device_put(state.params, p_sh),
        opt_state=jax.device_put(state.opt_state, rep),
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
    )
