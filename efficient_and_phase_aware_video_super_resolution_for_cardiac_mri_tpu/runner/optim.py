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

import numpy as np
import optax

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


_FACTORIES = {"Adam": _adam, "AdamW": _adamw, "SGD": _sgd, "RMSprop": _rmsprop}


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
        self.base_lr = 1e-3 if lr is None else float(lr)
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
