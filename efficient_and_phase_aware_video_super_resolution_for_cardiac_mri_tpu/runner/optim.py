"""Optimizers and LR schedulers under the reference's torch names.

Configs name ``torch.optim`` classes (``optimizer: {name: 'Adam', ...}``,
reference ``src/main.py:75-79``); these map to optax with torch-default
hyperparameters.  ``inject_hyperparams`` exposes ``learning_rate`` in the
optimizer state so epoch-level schedulers can adjust it without rebuilding
the jitted step.

Schedulers mirror ``torch.optim.lr_scheduler`` per-epoch semantics, including
the ``ReduceLROnPlateau`` branch the reference declares but cannot run
(``base_trainer.py:67`` references an undefined variable — SURVEY.md §5
quirk 1; it works here).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import numpy as np
import optax

import jax
import jax.numpy as jnp

from ..config import LR_SCHEDULERS, OPTIMIZERS


def _adam(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, amsgrad=False, **_):
    base = optax.adam(lr, b1=betas[0], b2=betas[1], eps=eps)
    if weight_decay:
        base = optax.chain(optax.add_decayed_weights(weight_decay), base)
    return base


def _adamw(lr=1e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=1e-2, **_):
    return optax.adamw(lr, b1=betas[0], b2=betas[1], eps=eps, weight_decay=weight_decay)


def _sgd(lr, momentum=0.0, weight_decay=0.0, nesterov=False, **_):
    base = optax.sgd(lr, momentum=momentum or None, nesterov=nesterov)
    if weight_decay:
        base = optax.chain(optax.add_decayed_weights(weight_decay), base)
    return base


def _rmsprop(lr=1e-2, alpha=0.99, eps=1e-8, weight_decay=0.0, momentum=0.0, **_):
    # torch.optim.RMSprop puts eps OUTSIDE the sqrt (g / (sqrt(v) + eps));
    # optax defaults to eps_in_sqrt=True, which changes early-step magnitudes
    # by orders of magnitude at the torch-default eps=1e-8
    base = optax.rmsprop(
        lr, decay=alpha, eps=eps, eps_in_sqrt=False, momentum=momentum or None
    )
    if weight_decay:
        base = optax.chain(optax.add_decayed_weights(weight_decay), base)
    return base


# ---------------------------------------------------------------------------
# The reference resolves ANY torch.optim class name by reflection
# (``src/main.py:76``), so the plausibly-nameable single-lr optimizers below
# are implemented torch-EXACTLY (eps placement, bias correction, and
# accumulator semantics all differ from optax's variants in ways that change
# early-step magnitudes by orders of magnitude — e.g. optax's scale_by_rss
# puts Adagrad's eps inside the sqrt; torch adds it after).  Each is a custom
# GradientTransformation mirroring torch's _single_tensor_* update rule;
# trajectory-tested against torch in tests/test_optim_torch_parity.py.


class _AdagradState(NamedTuple):
    count: jnp.ndarray
    sum_sq: optax.Updates


def _adagrad(lr=1e-2, lr_decay=0.0, weight_decay=0.0,
             initial_accumulator_value=0.0, eps=1e-10, **_):
    """torch.optim.Adagrad: clr = lr / (1 + (t-1)·lr_decay);
    p -= clr · g / (sqrt(Σg²) + eps)."""

    def init(params):
        return _AdagradState(
            count=jnp.zeros([], jnp.int32),
            sum_sq=jax.tree.map(
                lambda p: jnp.full_like(p, initial_accumulator_value), params
            ),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        sum_sq = jax.tree.map(lambda s, g: s + g * g, state.sum_sq, updates)
        clr = lr / (1.0 + (count - 1).astype(jnp.float32) * lr_decay)
        new = jax.tree.map(lambda g, s: -clr * g / (jnp.sqrt(s) + eps), updates, sum_sq)
        return new, _AdagradState(count, sum_sq)

    tx = optax.GradientTransformation(init, update)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


class _AdadeltaState(NamedTuple):
    square_avg: optax.Updates
    acc_delta: optax.Updates


def _adadelta(lr=1.0, rho=0.9, eps=1e-6, weight_decay=0.0, **_):
    """torch.optim.Adadelta: v = ρv + (1−ρ)g²; Δ = g·sqrt(u+eps)/sqrt(v+eps);
    u = ρu + (1−ρ)Δ²; p -= lr·Δ."""

    def init(params):
        # distinct zero trees: sharing one tree aliases the buffers, and the
        # trainers' donated train step then donates the same buffer twice
        return _AdadeltaState(
            square_avg=jax.tree.map(jnp.zeros_like, params),
            acc_delta=jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        del params
        v = jax.tree.map(lambda v, g: rho * v + (1 - rho) * g * g,
                         state.square_avg, updates)
        delta = jax.tree.map(
            lambda g, vi, u: g * jnp.sqrt(u + eps) / jnp.sqrt(vi + eps),
            updates, v, state.acc_delta,
        )
        u = jax.tree.map(lambda u, d: rho * u + (1 - rho) * d * d,
                         state.acc_delta, delta)
        new = jax.tree.map(lambda d: -lr * d, delta)
        return new, _AdadeltaState(square_avg=v, acc_delta=u)

    tx = optax.GradientTransformation(init, update)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


class _AdamaxState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def _adamax(lr=2e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0, **_):
    """torch.optim.Adamax: m = β₁m + (1−β₁)g; u = max(β₂u, |g| + eps) — NOTE
    torch puts eps inside the max (optax adds it to the denominator instead);
    p -= lr/(1−β₁ᵗ) · m/u."""
    b1, b2 = betas

    def init(params):
        # distinct zero trees — see _adadelta.init (donation aliasing)
        return _AdamaxState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        nu = jax.tree.map(
            lambda u, g: jnp.maximum(b2 * u, jnp.abs(g) + eps), state.nu, updates
        )
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        new = jax.tree.map(lambda m, u: -(lr / bc1) * m / u, mu, nu)
        return new, _AdamaxState(count, mu, nu)

    tx = optax.GradientTransformation(init, update)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


class _NAdamState(NamedTuple):
    count: jnp.ndarray
    mu_product: jnp.ndarray
    mu: optax.Updates
    nu: optax.Updates


def _nadam(lr=2e-3, betas=(0.9, 0.999), eps=1e-8, weight_decay=0.0,
           momentum_decay=4e-3, **_):
    """torch.optim.NAdam (Dozat with torch's momentum-decay schedule):
    μₜ = β₁(1 − ½·0.96^(t·ψ)); the update mixes the raw gradient (weighted by
    (1−μₜ)/(1−Πμ)) and the momentum (weighted by μₜ₊₁/(1−Πμ·μₜ₊₁)) over
    denom = sqrt(v/(1−β₂ᵗ)) + eps."""
    b1, b2 = betas
    psi = momentum_decay

    def init(params):
        # distinct zero trees — see _adadelta.init (donation aliasing)
        return _NAdamState(
            count=jnp.zeros([], jnp.int32),
            mu_product=jnp.ones([], jnp.float32),
            mu=jax.tree.map(jnp.zeros_like, params),
            nu=jax.tree.map(jnp.zeros_like, params),
        )

    def update(updates, state, params=None):
        del params
        count = state.count + 1
        t = count.astype(jnp.float32)
        mu_t = b1 * (1.0 - 0.5 * 0.96 ** (t * psi))
        mu_next = b1 * (1.0 - 0.5 * 0.96 ** ((t + 1.0) * psi))
        mu_product = state.mu_product * mu_t
        m = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, updates)
        v = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, updates)
        bc2 = 1.0 - b2 ** t
        w_g = lr * (1.0 - mu_t) / (1.0 - mu_product)
        w_m = lr * mu_next / (1.0 - mu_product * mu_next)
        new = jax.tree.map(
            lambda g, mi, vi: -(w_g * g + w_m * mi) / (jnp.sqrt(vi / bc2) + eps),
            updates, m, v,
        )
        return new, _NAdamState(count, mu_product, m, v)

    tx = optax.GradientTransformation(init, update)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


_FACTORIES = {
    "Adam": _adam, "AdamW": _adamw, "SGD": _sgd, "RMSprop": _rmsprop,
    "Adagrad": _adagrad, "Adadelta": _adadelta, "Adamax": _adamax, "NAdam": _nadam,
}

# torch's per-class default lr (used when a config omits ``lr``, mirroring the
# reference's reflection call with defaulted kwargs)
_DEFAULT_LR = {
    "Adam": 1e-3, "AdamW": 1e-3, "SGD": 1e-3, "RMSprop": 1e-2,
    "Adagrad": 1e-2, "Adadelta": 1.0, "Adamax": 2e-3, "NAdam": 2e-3,
}


def _find_apply_if_finite(state):
    """Locate the (outermost) ApplyIfFiniteState in an optax state pytree."""
    if isinstance(state, optax.ApplyIfFiniteState):
        return state
    if isinstance(state, (tuple, list)):
        for child in state:
            found = _find_apply_if_finite(child)
            if found is not None:
                return found
    elif isinstance(state, dict):
        for child in state.values():
            found = _find_apply_if_finite(child)
            if found is not None:
                return found
    return None


class Optimizer:
    """optax transform + the base lr, wrapped with inject_hyperparams.

    Framework extensions beyond the torch kwargs (the reference has neither):
    ``grad_clip_norm`` chains a global-norm clip before the update, and
    ``skip_nonfinite: N`` wraps with ``optax.apply_if_finite`` so a NaN/inf
    gradient skips the update instead of poisoning the params.  A bad update
    is NEVER applied (optax's own give-up-and-apply after N errors is
    disabled); instead the trainer calls :meth:`check_nonfinite` at each
    epoch boundary and aborts with a clear error once N consecutive steps
    were skipped — params and checkpoints stay clean either way.
    """

    def __init__(self, name: str, **kwargs):
        if name not in _FACTORIES:
            raise KeyError(f"Unknown optimizer {name!r}. Available: {sorted(_FACTORIES)}")
        lr = kwargs.pop("lr", None)
        self.base_lr = _DEFAULT_LR[name] if lr is None else float(lr)
        grad_clip_norm = kwargs.pop("grad_clip_norm", None)
        self.skip_nonfinite = int(kwargs.pop("skip_nonfinite", 0))
        skip_nonfinite = self.skip_nonfinite
        factory = _FACTORIES[name]

        def build(learning_rate):
            tx = factory(lr=learning_rate, **kwargs)
            if grad_clip_norm:
                tx = optax.chain(optax.clip_by_global_norm(grad_clip_norm), tx)
            if skip_nonfinite:
                # 2**31-1: never let optax "give up and apply" the NaN update
                # (its documented behavior past max_consecutive_errors) —
                # the error-out contract is enforced host-side in
                # check_nonfinite with the configured N
                tx = optax.apply_if_finite(tx, max_consecutive_errors=2**31 - 1)
            return tx

        self.tx = optax.inject_hyperparams(build)(learning_rate=self.base_lr)

    def check_nonfinite(self, opt_state) -> int:
        """Epoch-boundary guard for ``skip_nonfinite``: raise once N
        consecutive steps produced non-finite updates (every one of which was
        skipped, so params are still clean), and return the total number of
        skipped steps so far for logging.  Costs one scalar fetch."""
        if not self.skip_nonfinite:
            return 0
        state = _find_apply_if_finite(opt_state)
        if state is None:
            return 0
        consecutive = int(state.notfinite_count)
        if consecutive >= self.skip_nonfinite:
            raise RuntimeError(
                f"{consecutive} consecutive non-finite gradient steps (the "
                f"configured skip_nonfinite limit is {self.skip_nonfinite}). "
                f"Every bad update was skipped — params and checkpoints are "
                f"finite — but the run has diverged; aborting."
            )
        return int(state.total_notfinite)

    def init(self, params):
        return self.tx.init(params)

    def update(self, grads, state, params):
        return self.tx.update(grads, state, params)

    @staticmethod
    def set_lr(opt_state, lr: float):
        opt_state.hyperparams["learning_rate"] = np.asarray(lr, np.float32)
        return opt_state


for _name in _FACTORIES:
    OPTIMIZERS.add(_name, _name)  # names resolved by Optimizer(name=...)


class LRScheduler:
    """Epoch-indexed lr schedule with torch state-dict semantics."""

    def __init__(self, base_lr: float):
        self.base_lr = base_lr
        self.last_epoch = 0

    def step(self, valid_loss: float | None = None) -> float:
        self.last_epoch += 1
        return self.get_lr()

    def get_lr(self) -> float:
        raise NotImplementedError

    def state_dict(self) -> dict:
        return dict(self.__dict__)

    def load_state_dict(self, state: dict):
        self.__dict__.update(state)


@LR_SCHEDULERS.register()
class StepLR(LRScheduler):
    def __init__(self, base_lr, step_size, gamma=0.1):
        super().__init__(base_lr)
        self.step_size, self.gamma = step_size, gamma

    def get_lr(self):
        return self.base_lr * self.gamma ** (self.last_epoch // self.step_size)


@LR_SCHEDULERS.register()
class MultiStepLR(LRScheduler):
    def __init__(self, base_lr, milestones, gamma=0.1):
        super().__init__(base_lr)
        self.milestones, self.gamma = sorted(milestones), gamma

    def get_lr(self):
        n = sum(1 for m in self.milestones if m <= self.last_epoch)
        return self.base_lr * self.gamma**n


@LR_SCHEDULERS.register()
class ExponentialLR(LRScheduler):
    def __init__(self, base_lr, gamma):
        super().__init__(base_lr)
        self.gamma = gamma

    def get_lr(self):
        return self.base_lr * self.gamma**self.last_epoch


@LR_SCHEDULERS.register()
class CosineAnnealingLR(LRScheduler):
    def __init__(self, base_lr, T_max, eta_min=0.0):
        super().__init__(base_lr)
        self.T_max, self.eta_min = T_max, eta_min

    def get_lr(self):
        return self.eta_min + (self.base_lr - self.eta_min) * (
            1 + math.cos(math.pi * self.last_epoch / self.T_max)
        ) / 2


@LR_SCHEDULERS.register()
class ReduceLROnPlateau(LRScheduler):
    """torch ``ReduceLROnPlateau`` semantics: default ``threshold_mode='rel'``
    (improvement must beat ``best·(1∓threshold)``, not ``best∓threshold``)
    plus the ``cooldown`` epochs after each LR drop during which bad epochs
    are not counted."""

    def __init__(self, base_lr, mode="min", factor=0.1, patience=10, min_lr=0.0,
                 threshold=1e-4, threshold_mode="rel", cooldown=0, eps=1e-8):
        super().__init__(base_lr)
        if threshold_mode not in ("rel", "abs"):
            raise ValueError(f"threshold_mode should be 'rel' or 'abs'. Got {threshold_mode}.")
        self.mode, self.factor, self.patience = mode, factor, patience
        self.min_lr, self.threshold = min_lr, threshold
        self.threshold_mode, self.cooldown = threshold_mode, cooldown
        self.eps = eps
        self.current_lr = base_lr
        self.best = math.inf if mode == "min" else -math.inf
        self.num_bad = 0
        self.cooldown_counter = 0

    def _is_better(self, value):
        # torch lr_scheduler.ReduceLROnPlateau.is_better
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return value < self.best * (1.0 - self.threshold)
            return value < self.best - self.threshold
        if self.threshold_mode == "rel":
            return value > self.best * (1.0 + self.threshold)
        return value > self.best + self.threshold

    def step(self, valid_loss=None):
        self.last_epoch += 1
        if valid_loss is None:
            return self.current_lr
        # exact statement order of torch's ReduceLROnPlateau.step: the bad
        # count increments regardless, cooldown then zeroes it (and ticks
        # down even on improving epochs)
        if self._is_better(valid_loss):
            self.best = valid_loss
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            new_lr = max(self.min_lr, self.current_lr * self.factor)
            if self.current_lr - new_lr > self.eps:  # torch _reduce_lr eps
                self.current_lr = new_lr
            self.num_bad = 0
            self.cooldown_counter = self.cooldown
        return self.current_lr

    def get_lr(self):
        return self.current_lr


def build_optimizer(config) -> Optimizer:
    return Optimizer(config["name"], **dict(config.get("kwargs") or {}))


def build_lr_scheduler(config, base_lr: float) -> LRScheduler | None:
    if not config:
        return None
    cls = LR_SCHEDULERS.get(config["name"])
    return cls(base_lr, **dict(config.get("kwargs") or {}))
