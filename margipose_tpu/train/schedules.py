"""Optimiser schedules: 1cycle, multistep, and simple SGD/RMSProp.

(reference: src/margipose/hyperparam_scheduler.py:6-42 and
src/margipose/train_helpers.py:57-78). Hyperparameter interpolation is
expressed as optax schedules so the whole update rule compiles into the
pjit-ed train step — no per-batch host work.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


def piecewise_interpolate_schedule(ts, values):
    """Linear interpolation through (t, value) milestones, matching
    ``np.interp`` / the reference HyperparameterScheduler.batch_step
    (reference: src/margipose/hyperparam_scheduler.py:37-42)."""
    ts = jnp.asarray(np.asarray(ts, dtype=np.float32))
    values = jnp.asarray(np.asarray(values, dtype=np.float32))

    def schedule(count):
        count = jnp.asarray(count, dtype=jnp.float32)
        return jnp.interp(count, ts, values)

    return schedule


def onecycle_schedules(max_iters, lr_max, momentum=0.9):
    """The reference 1cycle policy (reference:
    src/margipose/hyperparam_scheduler.py:6-21): lr ramps
    lr_max/10 -> lr_max -> lr_max/10 -> lr_max/1e4 at t=[1, 0.45T, 0.9T, T];
    momentum 0.9 -> 0.85 -> 0.9.

    Note: the reference increments its counter *before* the first batch, so
    its step-1 value applies to our count=0. We shift the milestones by 1.
    """
    lr_min = lr_max * 1e-1
    lr_nihil = lr_min * 1e-3
    t3 = max_iters
    t2 = 0.9 * t3
    t1 = t2 / 2
    m_max = momentum
    m_min = min(m_max, 0.85)
    ts = [t - 1 for t in [1, t1, t2, t3]]
    lr = piecewise_interpolate_schedule(ts, [lr_min, lr_max, lr_min, lr_nihil])
    mom = piecewise_interpolate_schedule(ts, [m_max, m_min, m_max, m_max])
    return lr, mom


def multistep_schedule(lr, milestones, gamma, steps_per_epoch):
    """Epoch-milestone step decay (torch MultiStepLR semantics)."""
    boundaries = {int(m * steps_per_epoch): gamma for m in milestones}
    return optax.piecewise_constant_schedule(lr, boundaries)


class SGDMState(NamedTuple):
    count: jax.Array  # i32 scalar step counter driving the schedules
    trace: optax.Params  # torch-style momentum buffers


class FusedGradientTransformation(NamedTuple):
    """An optax GradientTransformation plus fused apply paths.

    The generic optax pattern (update -> apply_updates, plus
    inject_hyperparams for schedules) walks the parameter pytree once per
    chained transform — for this model that is ~1100 leaves x 4 elementwise
    passes. On TPU the cost is dominated not by the arithmetic but by
    per-buffer overhead at the jit boundary (~5-10us per output array), so
    the optimiser costs more wall-clock than the whole backward pass.

    ``fused_apply`` computes the momentum buffer and the updated parameter
    in ONE pytree pass (XLA emits a single multi-output fusion per leaf).
    ``init``/``update`` keep the standard optax contract (same numerics)
    for generic callers.
    """

    init: Callable
    update: Callable
    fused_apply: Callable  # (grads, state, params) -> (new_params, new_state)


def sgd_momentum_scheduled(lr_sched, mom_sched) -> FusedGradientTransformation:
    """Momentum SGD with per-step lr/momentum schedules, torch semantics:
    ``buf = momentum * buf + grad; p -= lr * buf``
    (reference: src/margipose/hyperparam_scheduler.py:24-42 drives torch.SGD)."""
    lr_sched = lr_sched if callable(lr_sched) else (lambda _: lr_sched)
    mom_sched = mom_sched if callable(mom_sched) else (lambda _: mom_sched)

    def init(params):
        return SGDMState(
            count=jnp.zeros((), jnp.int32),
            trace=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params=None):
        del params
        lr = lr_sched(state.count)
        m = mom_sched(state.count)
        new_trace = jax.tree.map(lambda g, t: g + m * t, grads, state.trace)
        updates = jax.tree.map(lambda t: -lr * t, new_trace)
        return updates, SGDMState(state.count + 1, new_trace)

    def fused_apply(grads, state, params):
        lr = lr_sched(state.count)
        m = mom_sched(state.count)
        is_pair = lambda x: isinstance(x, tuple)
        pairs = jax.tree.map(
            lambda p, g, t: (p - lr * (g + m * t), g + m * t),
            params, grads, state.trace)
        new_params = jax.tree.map(lambda x: x[0], pairs, is_leaf=is_pair)
        new_trace = jax.tree.map(lambda x: x[1], pairs, is_leaf=is_pair)
        return new_params, SGDMState(state.count + 1, new_trace)

    return FusedGradientTransformation(init, update, fused_apply)


def schedule_values(algorithm: str, lr: float, step: int, max_iters: int = None,
                    milestones=None, gamma=None, steps_per_epoch: int = None):
    """Host-side (lr, momentum) the optimiser applies at update ``step`` —
    for the epoch meters (the reference logs its scheduler's values the same
    way; reference: src/margipose/hyperparam_scheduler.py:24-42). Pure
    recomputation from the config: the schedules are deterministic functions
    of the step counter, so nothing needs to be read off the device."""
    if algorithm == '1cycle':
        lr_sched, mom_sched = onecycle_schedules(max_iters, lr_max=lr,
                                                 momentum=0.9)
        return float(lr_sched(step)), float(mom_sched(step))
    if algorithm == 'sgd_simple':
        return float(lr), 0.0
    if algorithm in ('sgd', 'nesterov', 'rmsprop'):
        # momentum constants mirror make_optimiser's presets below — keep
        # the two in sync (trajectory-pinned in tests/test_reference_parity)
        sched = multistep_schedule(lr, milestones, gamma, steps_per_epoch)
        return float(sched(step)), (0.8 if algorithm == 'nesterov' else 0.0)
    raise ValueError(f'unrecognised optimisation algorithm: {algorithm}')


def make_optimiser(algorithm: str, lr: float, max_iters: int = None,
                   milestones=None, gamma=None, steps_per_epoch: int = None):
    """Build the optax transform for a named algorithm, mirroring the
    reference presets (reference: src/margipose/bin/train_3d.py:234-239,338-347)."""
    if algorithm == '1cycle':
        lr_sched, mom_sched = onecycle_schedules(max_iters, lr_max=lr, momentum=0.9)
        return sgd_momentum_scheduled(lr_sched, mom_sched)
    if algorithm == 'sgd_simple':
        return optax.sgd(lr)
    if algorithm == 'sgd':
        sched = multistep_schedule(lr, milestones, gamma, steps_per_epoch)
        return optax.sgd(sched)
    if algorithm == 'nesterov':
        sched = multistep_schedule(lr, milestones, gamma, steps_per_epoch)
        return optax.sgd(sched, momentum=0.8, nesterov=True)
    if algorithm == 'rmsprop':
        sched = multistep_schedule(lr, milestones, gamma, steps_per_epoch)
        # torch.optim.RMSprop semantics (the reference's optimiser,
        # reference: src/margipose/train_helpers.py:75): alpha=0.99 decay
        # and eps OUTSIDE the sqrt — optax's defaults (0.9, eps inside)
        # differ on both counts. Trajectory-pinned to torch in
        # tests/test_reference_parity.py.
        return optax.rmsprop(sched, decay=0.99, eps=1e-8, eps_in_sqrt=False)
    raise ValueError(f'unrecognised optimisation algorithm: {algorithm}')
