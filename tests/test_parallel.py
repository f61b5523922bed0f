"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from scae_tpu.factory import make_scae
from scae_tpu.optim import make_optimizer
from scae_tpu.parallel.mesh import (
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    param_shardings,
    replicate_sharding,
)
from scae_tpu.parallel.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
    shard_state,
)


def tiny_model():
    return make_scae(dict(
        image_shape=(1, 24, 24),
        n_classes=10,
        n_part_caps=8,
        n_obj_caps=4,
        pcae_cnn_encoder_params=dict(out_channels=[16] * 4),
        pcae_template_generator_params=dict(template_size=(6, 6)),
        ocae_encoder_set_transformer_params=dict(dim_hidden=8, dim_out=16),
        ocae_decoder_capsule_params=dict(dim_caps=8, hidden_sizes=(16,)),
        scae_params=dict(reconstruct_alternatives=False),
    ))


def _batch(batch_size):
    rng = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rng.rand(batch_size, 1, 24, 24), jnp.float32),
        "label": jnp.asarray(rng.randint(0, 10, batch_size), jnp.int32),
    }


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_data_parallel_step_runs_and_shards():
    mesh = make_mesh(n_data=8, n_model=1)
    model = tiny_model()
    tx = make_optimizer("rmsprop", 1e-4, batch_size=16)
    batch = _batch(16)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    state = shard_state(state, mesh, model_axis=False)

    step = make_train_step(model, tx, mesh=mesh)
    batch = jax.device_put(batch, batch_sharding(mesh))
    with mesh:
        state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert int(state2.step) == 1
    # batch sharded over data axis
    assert len(batch["image"].sharding.device_set) == 8


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_tp_mesh_shards_capsule_banks():
    mesh = make_mesh(n_data=4, n_model=2)
    model = tiny_model()
    tx = make_optimizer("adam", 1e-4, batch_size=8)
    batch = _batch(8)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    shardings = param_shardings(mesh, state.params)
    bank = shardings["obj_decoder"]["capsule_layer"]["mlps"]["kernel_0"]
    assert MODEL_AXIS in bank.spec
    state = shard_state(state, mesh)

    step = make_train_step(model, tx, mesh=mesh, donate=False)
    batch = jax.device_put(batch, batch_sharding(mesh))
    with mesh:
        state2, metrics = step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # capsule bank params stay sharded over the model axis after update
    new_bank = state2.params["obj_decoder"]["capsule_layer"]["mlps"][
        "kernel_0"]
    assert len(new_bank.sharding.device_set) >= 2


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_dp_matches_single_device_loss():
    """Same params + batch must give identical eval loss on 1 vs 8 devices."""
    model = tiny_model()
    tx = make_optimizer("adam", 1e-4, batch_size=16)
    batch = _batch(16)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    eval_single = make_eval_step(model)
    loss_single = float(eval_single(state.params, batch)["loss"])

    mesh = make_mesh(n_data=8, n_model=1)
    eval_dp = make_eval_step(model, mesh=mesh)
    batch_sharded = jax.device_put(batch, batch_sharding(mesh))
    params_rep = jax.device_put(state.params, replicate_sharding(mesh))
    with mesh:
        loss_dp = float(eval_dp(params_rep, batch_sharded)["loss"])
    np.testing.assert_allclose(loss_dp, loss_single, rtol=1e-5)


def test_dp_train_step_with_gather_kernel():
    """Full dp-sharded TRAIN step with fused_impl='gather': the kernel's
    batch-dim custom_partitioning must produce the same loss and updated
    params as the single-device run (interpret mode on the CPU mesh)."""
    model = make_scae(dict(
        image_shape=(1, 24, 24),
        n_classes=10,
        n_part_caps=8,
        n_obj_caps=4,
        pcae_cnn_encoder_params=dict(out_channels=[16] * 4),
        pcae_template_generator_params=dict(template_size=(6, 6)),
        pcae_decoder_params=dict(fused_impl="gather"),
        ocae_encoder_set_transformer_params=dict(dim_hidden=8, dim_out=16),
        ocae_decoder_capsule_params=dict(dim_caps=8, hidden_sizes=(16,)),
        scae_params=dict(reconstruct_alternatives=False),
    ))
    tx = make_optimizer("adam", 1e-4, batch_size=16)
    batch = _batch(16)
    state = create_train_state(model, tx, batch, jax.random.PRNGKey(0))

    step_single = make_train_step(model, tx)
    s1, m1 = step_single(state, batch)

    mesh = make_mesh(n_data=8, n_model=1)
    step_dp = make_train_step(model, tx, mesh=mesh)
    state2 = create_train_state(model, tx, batch, jax.random.PRNGKey(0))
    batch_sharded = jax.device_put(batch, batch_sharding(mesh))
    state2 = jax.device_put(state2, replicate_sharding(mesh))
    with mesh:
        s2, m2 = step_dp(state2, batch_sharded)

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(s1.params)),
                    jax.tree_util.tree_leaves(jax.device_get(s2.params))):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge
    n = min(8, len(jax.devices()))
    ge.dryrun_multichip(n)
