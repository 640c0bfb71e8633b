"""Deterministic seeding discipline.

The reference seeds python's ``random`` with a (possibly string) seed, then
derives the torch seed from ``random.getstate()[1][1]`` and reseeds numpy per
epoch from a pre-sampled list (reference ``src/main.py:31-36``,
``src/runner/trainers/base_trainer.py:49-54``).  We keep the same shape of the
contract — one config seed fans out to every RNG consumer, all derived state is
checkpointable — but fan out into JAX threefry keys.
"""
from __future__ import annotations

import random
from dataclasses import dataclass, field

import numpy as np


@dataclass
class SeedState:
    """All RNG state derived from the config seed."""

    seed: object
    base_int: int
    np_random_seeds: list[int] = field(default_factory=list)

    def jax_key(self):
        import jax

        return jax.random.PRNGKey(self.base_int % (2**31 - 1))


def seed_everything(seed: object, num_epochs: int = 0) -> SeedState:
    """Seed python ``random`` and derive the integer base seed.

    Accepts the reference's string seeds (e.g. ``'vsr'``,
    ``configs/train/refine_net/exp1_x4.yaml:2``).  ``np_random_seeds`` mirrors
    the per-epoch numpy reseeding list (``base_trainer.py:49-50``) and is
    checkpointed so resume is reproducible.
    """
    random.seed(seed)
    base_int = random.getstate()[1][1]
    np_random_seeds = random.sample(range(10000000), k=num_epochs) if num_epochs else []
    return SeedState(seed=seed, base_int=base_int, np_random_seeds=np_random_seeds)


def epoch_rng(state: SeedState, epoch: int) -> np.random.Generator:
    """Per-epoch numpy Generator (epoch is 1-based, as in the reference)."""
    if state.np_random_seeds:
        seed = state.np_random_seeds[epoch - 1]
    else:
        seed = (state.base_int + epoch) % (2**31 - 1)
    return np.random.default_rng(seed)


def item_rng(epoch_seed: int, index: int) -> np.random.Generator:
    """Deterministic per-item Generator for augmentations.

    Unlike the reference (whose worker-global python ``random`` stream makes
    augmentation depend on worker scheduling), augmentation here is a pure
    function of (epoch, item index), so runs are reproducible regardless of
    loader parallelism.
    """
    return np.random.default_rng(np.random.SeedSequence([epoch_seed, index]))
