"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.8); the TPU-native plan is
SPMD over a named mesh with up to three axes, all driven by sharding
annotations (GSPMD inserts the collectives over ICI):

* ``data`` — batch axis sharded; gradients all-reduced by the partitioner
  when the jitted loss averages over the sharded batch axis.
* ``spatial`` — the image/volume height axis sharded.  Convolutions under
  GSPMD get automatic halo exchange, so the whole conv-net forward/backward
  partitions spatially without model changes.  This is the axis that scales a
  SINGLE patient (batch-1 serving is chip-saturated — PERF_NOTES.md batch
  sweep — so lower latency must come from splitting the frame, and it also
  cuts per-device activation memory for large DSB15 volumes).
* ``model`` — parameter sharding (ZeRO-3 / FSDP semantics): conv kernels are
  STORED sharded on their out-feature axis — params + optimizer state divide
  across the axis (the memory win for EDVR's 40-block trunk) — and gathered
  at compute time via ``gather_for_compute`` inside the jitted step, so the
  transient replicated copy lives only for the step.

``spatial`` and ``model`` are mutually exclusive (``make_mesh`` enforces it):
XLA's SPMD partitioner (jax 0.9.0) miscompiles convolutions whose spatially-
sharded operands are additionally PARTIALLY REPLICATED over a third mesh
axis — measured max-abs error 26 on the forward (feature-sharded kernel +
halo) and 0.023 on the weight gradient (even with fully replicated kernels),
on an 8-device CPU (data, spatial, model) mesh; every two-axis combination
and 1x1 kernels are exact, and constraint placement only shuffles which
variant breaks.  Each supported mesh (dp, dp x sp, dp x tp) is locked to
single-device numerics by tests/test_parallel.py.

The mesh is laid out (data, spatial, model) so the fastest-varying axes —
the ones with per-layer collectives — sit on adjacent devices (innermost on
an ICI torus).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"
MODEL_AXIS = "model"


def make_mesh(
    num_devices: int | None = None,
    model_parallel: int = 1,
    spatial_parallel: int = 1,
) -> Mesh:
    """Named mesh with a ``data`` axis and optional ``spatial``/``model`` axes.

    ``data`` takes whatever is left: data = n / (spatial · model).
    """
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(
            f"parallel.num_devices={n} but only {len(devices)} device(s) are "
            f"visible ({devices[0].platform}). Lower num_devices; a config "
            "with device: 'cpu' self-provisions the virtual mesh when run "
            "through the CLI entry points (library users: set "
            "jax_num_cpu_devices before any backend use)."
        )
    sp, mp = spatial_parallel, model_parallel
    if sp > 1 and mp > 1:
        raise ValueError(
            "spatial_parallel and model_parallel cannot be combined: XLA's "
            "SPMD partitioner miscompiles convs whose spatially-sharded "
            "operands are partially replicated over a third axis (see "
            "parallel/mesh.py docstring for the measurements)."
        )
    if n % (sp * mp):
        raise ValueError(
            f"{n} devices not divisible by spatial_parallel={sp} x model_parallel={mp}."
        )
    grid = np.asarray(devices[:n])
    dims = [(DATA_AXIS, n // (sp * mp))]
    if sp > 1:
        dims.append((SPATIAL_AXIS, sp))
    if mp > 1:
        dims.append((MODEL_AXIS, mp))
    names = tuple(name for name, _ in dims)
    return Mesh(grid.reshape(tuple(size for _, size in dims)), names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def video_spec(mesh: Mesh, ndim: int) -> P:
    """PartitionSpec for an image/video array: batch over ``data``, height
    over ``spatial`` (if the mesh has that axis).

    Height is axis ``ndim - 3`` for both (B, H, W, C) and (B, T, H, W, C).
    """
    spec = [None] * ndim
    spec[0] = DATA_AXIS
    if SPATIAL_AXIS in mesh.axis_names and ndim >= 4:
        spec[ndim - 3] = SPATIAL_AXIS
    return P(*spec)


#: batch keys eligible for ``spatial`` (height) sharding.  Image/video arrays
#: in this framework are channels-LAST — (B, H, W, C) or (B, T, H, W, C), so
#: height is axis ndim-3 — and every such key matches this predicate.  A
#: rank-4 array under an unknown key (e.g. a (B, T, H, W) mask with no channel
#: axis) gets batch-only sharding rather than a silently wrong layout.
def _spatial_key(key) -> bool:
    return isinstance(key, str) and ("img" in key or key in ("lr", "hr", "pos", "pos_code"))


def pad_height_to_multiple(arr: np.ndarray, multiple: int) -> np.ndarray:
    """The ``pad_h`` contract in ONE place (predictor + batch_infer CLI):
    edge-extend the height axis (``ndim - 3``, channels-last) at the BOTTOM
    to the next multiple of ``multiple`` so indivisible heights still shard
    over ``spatial``; callers crop outputs back with ``[..., :true_h, :, :]``.
    Edge mode keeps conv borders closer to the unpadded numerics than zeros
    (documented tradeoff in docs/TPU_EXTENSIONS.md)."""
    arr = np.asarray(arr)
    h_axis = arr.ndim - 3
    pad = -arr.shape[h_axis] % multiple
    if not pad:
        return arr
    widths = [(0, 0)] * arr.ndim
    widths[h_axis] = (0, pad)
    return np.pad(arr, widths, mode="edge")


def shard_batch(mesh: Mesh | None, batch: dict) -> dict:
    """Place a host batch on device: batch axis over ``data``; the height axis
    of channels-last image/video arrays (rank >= 4 under a ``_spatial_key``)
    additionally over ``spatial`` when the mesh has that axis (and the size
    divides).  Scalars / indivisible arrays are replicated on the offending
    axis.
    """
    if mesh is None:
        return jax.tree.map(jax.numpy.asarray, batch)
    repl = replicated(mesh)
    dp = mesh.shape[DATA_AXIS]
    sp = mesh.shape.get(SPATIAL_AXIS, 1)

    def put(x, spatial_ok: bool):
        x = np.asarray(x)
        if x.ndim < 1:
            return jax.device_put(x, repl)
        # the ideal layout, then downgrade axes that don't divide — the axes
        # decide independently: batch-1 prediction replicates over ``data``
        # but still shards the height axis over ``spatial``
        spec = list(video_spec(mesh, x.ndim)) if spatial_ok else (
            [DATA_AXIS] + [None] * (x.ndim - 1)
        )
        if spec[0] == DATA_AXIS and x.shape[0] % dp != 0:
            spec[0] = None
            if x.shape[0] > 1:
                # batch-1 prediction replicates silently by design; a
                # multi-item batch losing data parallelism (the final partial
                # batch of every epoch without drop_last — plus a recompile
                # for the new shape) deserves a heads-up like spatial's
                _warn_once(
                    ("data", x.shape),
                    f"batch {x.shape[0]} of a {x.shape} array is not "
                    f"divisible by the data axis ({dp}); replicating it over "
                    "'data' (no data parallelism for this step). Set "
                    "drop_last or pick a divisible batch size.",
                )
        h_axis = x.ndim - 3
        if x.ndim >= 4 and spec[h_axis] == SPATIAL_AXIS and x.shape[h_axis] % sp != 0:
            spec[h_axis] = None
            _warn_once(
                ("spatial", x.shape),
                f"height {x.shape[h_axis]} of a {x.shape} array is not "
                f"divisible by spatial_parallel={sp}; replicating it over "
                "the spatial axis (no latency win for this item). Pad or "
                "bucket H to a multiple to shard.",
            )
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    if isinstance(batch, dict):
        return {
            k: jax.tree.map(lambda x, ok=_spatial_key(k): put(x, ok), v)
            for k, v in batch.items()
        }
    return jax.tree.map(lambda x: put(x, True), batch)


_WARNED: set = set()


def _warn_once(key, msg: str) -> None:
    if key not in _WARNED:
        _WARNED.add(key)
        import logging

        logging.getLogger(__name__).warning(msg)


def param_spec(leaf, mesh: Mesh) -> P:
    """Tensor-parallel PartitionSpec for one parameter leaf.

    Conv/dense kernels (rank >= 2) shard their LAST (out-feature) axis over
    ``model`` when it divides; everything else — biases, PReLU scalars,
    norm stats — is replicated.  Gradients stay correct with no manual psum:
    GSPMD derives the reduction from the sharding annotations.
    """
    if MODEL_AXIS not in mesh.axis_names:
        return P()
    mp = mesh.shape[MODEL_AXIS]
    if getattr(leaf, "ndim", 0) >= 2 and leaf.shape[-1] % mp == 0:
        return P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
    return P()


def partition_tree(mesh: Mesh | None, tree):
    """device_put a params-like pytree with per-leaf tensor-parallel specs.

    With no ``model`` axis (or no mesh) this is plain replication, so callers
    can use it unconditionally.  Works for optimizer states too — mu/nu mirror
    the param shapes so they get the same specs; counts replicate.
    """
    if mesh is None:
        return tree
    return jax.tree.map(
        lambda l: jax.device_put(l, NamedSharding(mesh, param_spec(l, mesh))), tree
    )


def gather_for_compute(mesh: Mesh | None, tree):
    """ZeRO-3 gather point: inside a jitted step, constrain a ``model``-axis
    sharded param tree to replicated so downstream convs compute on full
    kernels.  XLA turns the constraint into one all-gather per step (and the
    grad cotangent reshards back to the param specs, i.e. a reduce-scatter).
    No-op without a mesh or a ``model`` axis — safe to call unconditionally.
    """
    if mesh is None or MODEL_AXIS not in mesh.axis_names:
        return tree
    repl = NamedSharding(mesh, P())
    return jax.lax.with_sharding_constraint(
        tree, jax.tree.map(lambda _: repl, tree)
    )


def replicate_tree(mesh: Mesh | None, tree):
    if mesh is None:
        return tree
    return jax.device_put(tree, replicated(mesh))
