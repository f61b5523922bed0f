import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from scae_tpu.optim import lookahead, make_optimizer, radam, reference_eps


def _run(tx, n_steps, x0, target):
    params, state = x0, tx.init(x0)
    traj = []
    for _ in range(n_steps):
        grads = jax.grad(lambda p: jnp.sum((p - target) ** 2))(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        traj.append(params)
    return traj


def test_radam_early_steps_are_sgd():
    """rho_t < 5 for the first steps (b2=0.999) -> SGD fallback with
    bias-corrected momentum, no second-moment scaling."""
    x0 = jnp.asarray([1.0, -2.0])
    target = jnp.zeros(2)
    tx = radam(0.1)
    traj = _run(tx, 1, x0, target)
    # step 1: mu = (1-b1)*g, bias1 = 1-b1 -> update = -lr * g
    g = 2 * (x0 - target)
    np.testing.assert_allclose(np.asarray(traj[0]),
                               np.asarray(x0 - 0.1 * g), rtol=1e-5)


def test_radam_converges():
    x0 = jnp.asarray([3.0, -1.5, 0.7])
    target = jnp.asarray([0.5, 0.5, 0.5])
    traj = _run(radam(0.05), 300, x0, target)
    np.testing.assert_allclose(np.asarray(traj[-1]), np.asarray(target),
                               atol=0.05)


def test_radam_no_sgd_fallback_option():
    x0, target = jnp.ones(2), jnp.zeros(2)
    traj = _run(radam(0.1, degenerated_to_sgd=False), 2, x0, target)
    # updates are zero until rho_t >= 5
    np.testing.assert_allclose(np.asarray(traj[0]), np.asarray(x0))


def test_lookahead_sync_every_k():
    x0, target = jnp.ones(4), jnp.zeros(4)
    base = optax.sgd(0.1)
    tx = lookahead(base, alpha=0.5, k=3)
    params, state = x0, tx.init(x0)
    fast_only = x0
    slow = x0
    for step in range(1, 7):
        grads = jax.grad(lambda p: jnp.sum((p - target) ** 2))(params)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        # manual reference trajectory
        g2 = 2 * (fast_only - target)
        fast_only = fast_only - 0.1 * g2
        if step % 3 == 0:
            slow = slow + 0.5 * (fast_only - slow)
            fast_only = slow
        np.testing.assert_allclose(np.asarray(params), np.asarray(fast_only),
                                   rtol=1e-5, err_msg=f"step {step}")


def test_reference_eps_rule():
    assert reference_eps(128) == pytest.approx(1e-2 / 128 ** 2)


def test_make_optimizer_variants_step():
    x0 = jnp.ones(3)
    for name in ("rmsprop", "radam", "adam"):
        tx = make_optimizer(name, 1e-3, batch_size=32, use_lookahead=True,
                            lr_decay_rate=0.99, decay_steps=2)
        params, state = x0, tx.init(x0)
        grads = jnp.ones(3)
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        assert np.isfinite(np.asarray(params)).all()

    with pytest.raises(ValueError):
        make_optimizer("nope", 1e-3, batch_size=32)


def test_exponential_decay_staircase():
    """LR decays by gamma per epoch (transition_steps = steps/epoch),
    matching ExponentialLR semantics (base_experiment.py:72-77)."""
    sched = optax.exponential_decay(1.0, transition_steps=10,
                                    decay_rate=0.5, staircase=True)
    assert float(sched(0)) == 1.0
    assert float(sched(9)) == 1.0
    assert float(sched(10)) == 0.5
    assert float(sched(20)) == 0.25
