"""Optimizers: RAdam, LookAhead, RMSprop — optax-style, reference-exact.

Parity targets:
  * RAdam (reference optimizers.py:10-102, vendored from
    LiyuanLucasLiu/RAdam): rectified Adam with SMA-length rectification and
    degenerate-to-SGD fallback when the SMA length <= 4. Implemented here
    as a first-class optax GradientTransformation (the reference's 10-slot
    step cache is a CPU-side memoization detail, not semantics).
  * LookAhead (reference optimizers.py:105-190, paper 1907.08610): slow
    weights updated every k steps by slow += alpha*(fast - slow); fast
    weights reset to slow. Implemented with explicit slow-weight state (the
    reference's load_state_dict NameError — SURVEY.md §2.4(6) — has no
    analog here; state is a plain pytree checkpointed by Orbax).
  * The experiment harness' optimizer zoo: RMSprop(momentum, centered
    options), Adam, with the reference's eps = 1e-2 / batch_size**2 rule
    (base_experiment.py:47) and per-epoch ExponentialLR(gamma) decay
    (base_experiment.py:72-77).
"""

from typing import NamedTuple, Optional

import chex
import jax
import jax.numpy as jnp
import optax


class RAdamState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def radam(learning_rate, b1: float = 0.9, b2: float = 0.999,
          eps: float = 1e-8, weight_decay: float = 0.0,
          degenerated_to_sgd: bool = True) -> optax.GradientTransformation:
    """Rectified Adam matching the reference's update equations.

    Per step t (reference optimizers.py:64-100):
      mu_t = b1*mu + (1-b1)*g ; nu_t = b2*nu + (1-b2)*g^2
      rho_inf = 2/(1-b2) - 1 ; rho_t = rho_inf - 2t*b2^t/(1-b2^t)
      if rho_t >= 5:  r_t = sqrt(((1-b2^t)(rho_t-4)(rho_t-2)rho_inf) /
                                 ((rho_inf-4)(rho_inf-2)rho_t))
                      update = -lr * r_t/(1-b1^t) * mu_t / (sqrt(nu_t)+eps)
      elif degenerated_to_sgd: update = -lr * mu_t / (1-b1^t)
      else: update = 0
    Weight decay (if any) is applied as in the reference: decoupled
    p -= wd*lr*p before the main update.
    """

    def init_fn(params):
        return RAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params=None):
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g,
                          state.mu, updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g,
                          state.nu, updates)

        beta2_t = b2 ** t
        rho_inf = 2.0 / (1.0 - b2) - 1.0
        rho_t = rho_inf - 2.0 * t * beta2_t / (1.0 - beta2_t)
        bias1 = 1.0 - b1 ** t

        rect = jnp.sqrt(
            (1.0 - beta2_t) * (rho_t - 4.0) / (rho_inf - 4.0)
            * (rho_t - 2.0) / rho_t * rho_inf / (rho_inf - 2.0))
        use_rect = rho_t >= 5.0
        adam_step_size = jnp.where(use_rect, rect, 0.0) / bias1
        sgd_step_size = (1.0 / bias1) if degenerated_to_sgd else 0.0

        lr = learning_rate(count) if callable(learning_rate) \
            else learning_rate

        def per_param(m, v, p):
            adam_dir = m / (jnp.sqrt(v) + eps)
            sgd_dir = m
            upd = jnp.where(use_rect,
                            adam_step_size * adam_dir,
                            sgd_step_size * sgd_dir)
            upd = -lr * upd
            if weight_decay != 0.0 and p is not None:
                upd = upd - weight_decay * lr * p
            return upd

        if params is None:
            new_updates = jax.tree.map(
                lambda m, v: per_param(m, v, None), mu, nu)
        else:
            new_updates = jax.tree.map(per_param, mu, nu, params)
        return new_updates, RAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


class LookAheadState(NamedTuple):
    inner_state: optax.OptState
    slow_params: optax.Params
    step: chex.Array


def lookahead(base: optax.GradientTransformation, alpha: float = 0.5,
              k: int = 6) -> optax.GradientTransformation:
    """k-steps-forward-1-back wrapper (reference optimizers.py:105-150).

    Every k inner steps: slow += alpha * (fast - slow); fast = slow.
    The returned updates therefore fold the slow-weight pullback into the
    regular update pytree, so it composes with optax.apply_updates.
    """

    def init_fn(params):
        return LookAheadState(
            inner_state=base.init(params),
            slow_params=jax.tree.map(jnp.array, params),
            step=jnp.zeros([], jnp.int32),
        )

    def update_fn(updates, state, params):
        assert params is not None, "lookahead requires params"
        inner_updates, inner_state = base.update(updates, state.inner_state,
                                                 params)
        step = state.step + 1
        sync = (step % k == 0)

        def combine(p, u, slow):
            fast = p + u  # post-inner-update fast weight
            new_slow = slow + alpha * (fast - slow)
            new_fast = jnp.where(sync, new_slow, fast)
            new_slow = jnp.where(sync, new_slow, slow)
            return new_fast - p, new_slow

        flat_p, treedef = jax.tree.flatten(params)
        flat_u = treedef.flatten_up_to(inner_updates)
        flat_s = treedef.flatten_up_to(state.slow_params)
        outs = [combine(p, u, s) for p, u, s in zip(flat_p, flat_u, flat_s)]
        new_updates = treedef.unflatten([o[0] for o in outs])
        new_slow = treedef.unflatten([o[1] for o in outs])
        return new_updates, LookAheadState(inner_state=inner_state,
                                           slow_params=new_slow, step=step)

    return optax.GradientTransformation(init_fn, update_fn)


def reference_eps(batch_size: int) -> float:
    """The harness' eps rule: 1e-2 / batch_size**2 (base_experiment.py:47)."""
    return 1e-2 / float(batch_size) ** 2


def make_optimizer(name: str,
                   learning_rate: float,
                   batch_size: int,
                   momentum: float = 0.9,
                   use_lookahead: bool = False,
                   lookahead_alpha: float = 0.5,
                   lookahead_k: int = 6,
                   lr_decay_rate: Optional[float] = None,
                   decay_steps: int = 1,
                   weight_decay: float = 0.0,
                   eps: Optional[float] = None) -> optax.GradientTransformation:
    """Build the training optimizer like the reference harness
    (base_experiment.py:44-77): name in {rmsprop, radam, adam}, the
    eps=1e-2/B^2 rule, optional LookAhead wrapper, optional per-epoch
    exponential LR decay (decay_steps = steps per epoch)."""
    eps = reference_eps(batch_size) if eps is None else eps

    if lr_decay_rate is not None and lr_decay_rate != 1.0:
        schedule = optax.exponential_decay(
            init_value=learning_rate,
            transition_steps=decay_steps,
            decay_rate=lr_decay_rate,
            staircase=True,
        )
    else:
        schedule = learning_rate

    if name == "rmsprop":
        # eps_in_sqrt=False matches torch.optim.RMSprop's g/(sqrt(avg)+eps)
        # (optax's legacy default puts eps inside the sqrt, which with the
        # harness' tiny eps=1e-2/B^2 changes the dynamics materially)
        base = optax.rmsprop(schedule, decay=0.99, eps=eps,
                             eps_in_sqrt=False, momentum=momentum)
    elif name == "radam":
        base = radam(schedule, eps=eps, weight_decay=weight_decay)
    elif name == "adam":
        base = optax.adam(schedule, eps=eps)
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    if use_lookahead:
        base = lookahead(base, alpha=lookahead_alpha, k=lookahead_k)
    return base
