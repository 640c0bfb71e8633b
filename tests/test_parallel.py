"""Data-parallel SPMD tests on the fake 8-device CPU mesh (SURVEY.md §4c)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
    RefineNet,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")

CFG = dict(
    in_channels=1,
    out_channels=1,
    num_features=[4, 4],
    num_stages=1,
    upscale_factor=4,
    update_memory=True,
    num_updated_frames=2,
    refine_window_size=5,
    positional_encoding=True,
)
B, T, H, W = 8, 7, 8, 8  # T = 3 core + 2x2 warm-up


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lr_imgs": rng.standard_normal((B, T, H, W, 1)).astype(np.float32),
        "pos_code": rng.uniform(-1, 1, (B, T, 1)).astype(np.float32),
        "hr_imgs": rng.standard_normal((B, 3, H * 4, W * 4, 1)).astype(np.float32),
    }


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.shape[DATA_AXIS] == 8
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_all_devices():
    mesh = make_mesh(8)
    batch = shard_batch(mesh, _batch())
    assert len(batch["lr_imgs"].devices()) == 8
    assert batch["lr_imgs"].sharding.spec == P(DATA_AXIS)


def _loss_fn(model):
    def loss(params, batch):
        outs = model.apply({"params": params}, batch["lr_imgs"], batch["pos_code"])
        return sum(jnp.mean(jnp.abs(o - batch["hr_imgs"])) for o in outs)

    return loss


def test_data_parallel_train_step_matches_single_device():
    """One jitted step over the 8-device mesh == the same step on one device
    (GSPMD inserts the psum; numerics must agree)."""
    model = RefineNet(**CFG)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), batch["lr_imgs"], batch["pos_code"])["params"]
    tx = optax.adam(1e-3)
    loss = _loss_fn(model)

    def step(p, s, b):
        val, grads = jax.value_and_grad(loss)(p, b)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, val

    # single device
    p1, s1, v1 = jax.jit(step)(params, tx.init(params), jax.tree.map(jnp.asarray, batch))

    # 8-device mesh
    mesh = make_mesh(8)
    p_sharded = replicate_tree(mesh, params)
    s_sharded = replicate_tree(mesh, tx.init(params))
    b_sharded = shard_batch(mesh, batch)
    p8, s8, v8 = jax.jit(step)(p_sharded, s_sharded, b_sharded)

    assert float(v8) == pytest.approx(float(v1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_eval_sharded_by_sequence():
    """Full-volume multi-patient inference batched across the mesh
    (the BASELINE.json v5e-8 config, on fake devices)."""
    model = RefineNet(**CFG)
    batch = _batch(1)
    params = model.init(jax.random.PRNGKey(0), batch["lr_imgs"], batch["pos_code"])["params"]
    mesh = make_mesh(8)

    @jax.jit
    def forward(p, lr, pos):
        return model.apply({"params": p}, lr, pos)[-1]

    out1 = forward(params, batch["lr_imgs"], batch["pos_code"])
    sharded = shard_batch(mesh, batch)
    out8 = forward(replicate_tree(mesh, params), sharded["lr_imgs"], sharded["pos_code"])
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1), atol=1e-5)
