"""Optimizer trajectory parity vs torch.optim.

The reference resolves ANY ``torch.optim`` class by name
(``src/main.py:76``); every registered name here must therefore not just
exist but update like torch.  Each case runs 12 update steps on the same
params with the same deterministic gradient sequence on both sides and
compares the parameter trajectories.  A wrong eps placement, bias
correction, accumulator init, or momentum schedule diverges within the
first couple of steps by orders of magnitude more than the f32
reduction-order tolerance used here (the train-dynamics A/B files pin the
full loop; this file pins the optimizer surface itself).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
    Optimizer,
)

torch = pytest.importorskip("torch")

STEPS = 12
SHAPES = {"w": (5, 3), "b": (3,)}


def _grads(step, seed=0):
    """Deterministic, step-varying gradients (same arrays for both sides)."""
    rng = np.random.default_rng(seed + step)
    return {k: rng.standard_normal(s).astype(np.float32) for k, s in SHAPES.items()}


def _init_params(seed=42):
    rng = np.random.default_rng(seed)
    return {k: rng.standard_normal(s).astype(np.float32) for k, s in SHAPES.items()}


CASES = [
    # (name, kwargs) — torch defaults AND non-default hyperparams for each
    ("Adam", dict(lr=1e-4)),
    ("Adam", dict(lr=3e-4, betas=(0.8, 0.95), eps=1e-7, weight_decay=1e-4)),
    ("AdamW", dict(lr=3e-4, weight_decay=0.05)),
    ("SGD", dict(lr=0.1, momentum=0.9, weight_decay=1e-4)),
    ("RMSprop", dict(lr=1e-3, alpha=0.95, momentum=0.5, weight_decay=1e-4)),
    ("Adagrad", dict(lr=0.05)),
    ("Adagrad", dict(lr=0.05, lr_decay=1e-2, weight_decay=1e-4,
                     initial_accumulator_value=0.1, eps=1e-10)),
    ("Adadelta", dict(lr=0.8)),
    ("Adadelta", dict(lr=0.8, rho=0.95, eps=1e-5, weight_decay=1e-4)),
    ("Adamax", dict(lr=2e-3)),
    ("Adamax", dict(lr=4e-3, betas=(0.8, 0.99), eps=1e-7, weight_decay=1e-4)),
    ("NAdam", dict(lr=2e-3)),
    ("NAdam", dict(lr=4e-3, betas=(0.8, 0.99), eps=1e-7,
                   momentum_decay=6e-3, weight_decay=1e-4)),
]


@pytest.mark.parametrize("name,kwargs", CASES, ids=[f"{n}-{i}" for i, (n, _) in enumerate(CASES)])
def test_trajectory_matches_torch(name, kwargs):
    params = _init_params()

    # ---- torch side
    tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in params.items()}
    topt = getattr(torch.optim, name)(list(tparams.values()), **kwargs)
    for step in range(STEPS):
        grads = _grads(step)
        for k, p in tparams.items():
            p.grad = torch.tensor(grads[k])
        topt.step()

    # ---- ours
    opt = Optimizer(name, **kwargs)
    jparams = jax.tree.map(jnp.asarray, params)
    state = opt.init(jparams)
    for step in range(STEPS):
        grads = jax.tree.map(jnp.asarray, _grads(step))
        updates, state = opt.update(grads, state, jparams)
        jparams = optax.apply_updates(jparams, updates)

    for k in SHAPES:
        ours = np.asarray(jparams[k])
        theirs = tparams[k].detach().numpy()
        np.testing.assert_allclose(
            ours, theirs, rtol=2e-5, atol=2e-6,
            err_msg=f"{name}({kwargs}) diverged from torch on {k!r}",
        )


def test_default_lr_matches_torch_default():
    """Configs may omit ``lr`` entirely — the injected base lr must then be
    torch's per-class default, not a global 1e-3."""
    import inspect

    for name in ("Adam", "RMSprop", "Adagrad", "Adadelta", "Adamax", "NAdam"):
        torch_default = inspect.signature(getattr(torch.optim, name)).parameters["lr"].default
        assert Optimizer(name).base_lr == pytest.approx(torch_default), name


def test_unknown_name_lists_available():
    with pytest.raises(KeyError, match="Adagrad"):
        Optimizer("Rprop")
