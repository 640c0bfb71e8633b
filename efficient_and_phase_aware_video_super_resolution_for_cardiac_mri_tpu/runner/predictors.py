"""Predictors: test-time evaluation + export (reference ``src/runner/predictors/*``).

Contract kept from the reference: batch size 1, per-frame loss/metric tables,
Cardiac* metrics routed with the patient name parsed from the dataset path,
CSV / GIF / PNG export, log weighted by sequence length.

TPU design notes:
* the evaluation step is jitted; jax's compile cache keys on shapes, so each
  distinct (T, H, W) bucket compiles once and every same-shaped patient reuses
  it (SURVEY.md §7 "variable sequence length" hard part).
* Cardiac bbox crops enter the jitted step as data (masks), never as shapes —
  no recompile per patient (see ``metrics._CardiacMixin``).
* exports use imageio (the reference's ``scipy.misc.imsave`` was removed from
  scipy — quirk 9).
"""
from __future__ import annotations

import csv
import inspect
import logging
import os
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PREDICTORS
from ..ops import telemetry
from ..parallel import gather_for_compute, partition_tree, shard_batch
from ..utils.casting import cast_floating
from ..utils import nifti
from ..utils.dispatch import DoubleBuffer
from ..utils.stats import get_stats
from . import checkpoint as ckpt_io
from . import common

LOG = logging.getLogger(__name__)


def _dump_video(path, imgs):
    import imageio

    with imageio.get_writer(path) as writer:
        for img in imgs:
            writer.append_data(img)


def _dump_image(path, img):
    import imageio

    imageio.imwrite(path, img)


class BasePredictor:
    """Reference ``src/runner/predictors/base_predictor.py:6-136``."""

    dataset_stats = "acdc"
    enforce_batch_1 = True

    def __init__(
        self,
        device=None,
        test_dataloader=None,
        net=None,
        loss_fns=None,
        loss_weights=None,
        metric_fns=None,
        saved_dir=None,
        exported=False,
        mesh=None,
        dataset_stats: str | None = None,
        t_bucket: int = 0,
        compute_dtype: str | None = None,
        pad_h: bool = False,
        aot_cache: str | None = None,
        export_nifti: bool = False,
        tile=None,
        tile_overlap: int | None = None,
        telemetry: bool = True,
        telemetry_warn_frac: float = 0.0,
        seam_stats: bool | str = "first",
    ):
        self.device = device
        # TPU extension (``ops/tiling.py``): run the network forward on
        # fixed-shape overlapping spatial windows — ANY (H, W) then serves
        # through ONE compiled executable (DSB15's heterogeneous frame sizes
        # otherwise cost a flagship compile EACH) with HBM bounded by the
        # tile.  Exact when ``tile_overlap`` >= the net's receptive-field
        # radius (docs/TPU_EXTENSIONS.md has per-family guidance); the
        # overlap is mandatory with ``tile`` because no safe net-independent
        # default exists.  Losses/metrics run on the assembled full frame
        # (their small graphs still compile per shape — the multi-minute NET
        # compile is the one made shape-invariant).  Single-device serving
        # strategy: combine with neither a mesh nor ``pad_h``.
        if tile is not None:
            hw = (tile, tile) if np.ndim(tile) == 0 else tuple(int(t) for t in tile)
            if len(hw) != 2:
                raise ValueError(f"tile must be an int or (th, tw), got {tile!r}")
            if tile_overlap is None:
                raise ValueError(
                    "tile requires tile_overlap (>= the net's receptive-field "
                    "radius in LR pixels — see docs/TPU_EXTENSIONS.md)"
                )
            if tile_overlap < 0 or min(hw) <= 2 * int(tile_overlap):
                raise ValueError(
                    f"tile {hw} must exceed 2*tile_overlap "
                    f"({2 * int(tile_overlap)}) and tile_overlap must be >= 0"
                )
            if mesh is not None:
                raise ValueError(
                    "tile is a single-device serving strategy; unset parallel/mesh "
                    "(scale tiled serving by devices via tools/batch_infer)"
                )
            if pad_h:
                raise ValueError("tile replaces pad_h; enable only one")
            self._tile, self._tile_overlap = (int(hw[0]), int(hw[1])), int(tile_overlap)
        else:
            self._tile = self._tile_overlap = None
        # TPU extension (no reference counterpart): pad variable-length
        # sequences up to multiples of t_bucket so XLA compiles one executable
        # per bucket instead of one per distinct patient T (SURVEY §7
        # "bucketing/padding with mask-aware metrics"). 0 = exact/off.
        self.t_bucket = int(t_bucket or 0)
        # TPU extension: run the forward in bf16 (params/inputs cast inside
        # the jitted step; metrics on f32 denormalized outputs).
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None
        # TPU extension (``parallel: {pad_h: true}``): edge-extend the height
        # axis of image/video arrays to the next multiple of spatial_parallel
        # before the jitted step so indivisible DSB15-style heights still
        # shard over the ``spatial`` axis; outputs AND targets are cropped
        # back to the true height inside the step, so losses/metrics see only
        # real rows.  Tradeoff: the edge-extended input rows perturb conv
        # outputs within a receptive field of the bottom border vs the exact
        # meshless result (tested tolerance in test_parallel.py).
        self.pad_h = bool(pad_h)
        # TPU extension: directory for the persistent AOT *executable* cache
        # (utils/aot.py) — a serving process restart skips the 5-10 min
        # tunnel compile of the big graph, which jax's persistent
        # compilation cache measurably does not avoid (PERF_NOTES.md).
        # EVSR_AOT_CACHE provides it environment-wide.
        self.aot_cache = aot_cache or os.environ.get("EVSR_AOT_CACHE") or None
        self.mesh = mesh
        self.test_dataloader = test_dataloader
        self.net = net
        self.loss_fns = list(loss_fns or [])
        self.loss_weights = np.asarray(
            loss_weights if loss_weights is not None else [1.0] * len(self.loss_fns), np.float32
        )
        self.metric_fns = list(metric_fns or [])
        if self.enforce_batch_1 and test_dataloader is not None and test_dataloader.batch_size != 1:
            raise ValueError(
                f"The testing batch size should be 1. Got {test_dataloader.batch_size}."
            )
        if exported or export_nifti:
            self.saved_dir = Path(saved_dir)
        self.exported = exported
        # TPU-rebuild extension (no reference counterpart): write the SR
        # output back as NIfTI volumes in the preprocessed trees' (H, W, 1, T)
        # layout — the artifact clinical/research consumers load, alongside
        # the reference's CSV/GIF/PNG.  Values are the display protocol
        # (denormalized, rounded, clamped — identical to what metrics see).
        self.export_nifti = bool(export_nifti)
        if dataset_stats:
            self.dataset_stats = dataset_stats
        self.mean, self.std = get_stats(self.dataset_stats)
        self.params = None
        self.model_state = {}
        self._accepts_train = common.accepts_train_kwarg(net)
        self._step = None
        self.log = None
        self.throughput = {"frames_per_sec": 0.0, "frames": 0}
        # Windowed-approximation exceedance telemetry (ops/telemetry.py):
        # ON by default — nets with a max_flow / dcn_max_offset knob publish
        # per-site [out-of-window count, total, max |displacement|] triples
        # through the "telemetry" variable collection; nets without the knobs
        # sow nothing and the collection costs nothing.  Any item whose
        # out-of-window fraction exceeds ``telemetry_warn_frac`` logs a
        # warning with the remedy (raise the knob or drop it).
        self.telemetry = bool(telemetry)
        self.telemetry_warn_frac = float(telemetry_warn_frac)
        self.telemetry_summary: dict = {}
        # per-run tile-seam measurements (tiled serving only; ops/tiling.py
        # seam_stats) — max over measured items of the seam rms/max in
        # display units.  Probes cost up to 4 extra tile forwards per
        # measured item (up to 2x the network compute on a 2x2 plan), so the
        # default "first" probes only the FIRST item of each distinct input
        # (H, W) — one live measurement per tile plan per run; True probes
        # every item, False disables.  Independent of ``telemetry`` (which
        # is free for nets without windowed knobs; seam probes are not).
        if seam_stats not in (True, False, "first"):
            raise ValueError(
                f"seam_stats must be True, False or 'first'; got {seam_stats!r}"
            )
        self.seam_stats = seam_stats
        self._seam_probed_shapes: set = set()
        self.seam_summary: dict = {}

    # ------------------------------------------------------------- workload
    def _model_inputs(self, batch) -> tuple:
        raise NotImplementedError

    def _targets(self, batch):
        raise NotImplementedError

    def _denorm(self, x):
        return common.denorm_uint8(x, self.mean, self.std)

    def _select_output(self, outputs):
        return outputs

    def _bucket_batch(self, batch):
        """Hook: pad the batch's time axis to the bucket length.  Returns
        (batch, true_T or None); the base (non-sequence) workloads are
        fixed-shape and never bucket."""
        return batch, None

    def _pad_spatial(self, batch):
        """pad_h: edge-extend the height axis of image/video arrays to the
        next multiple of ``spatial_parallel`` so indivisible heights still
        shard.  Returns (batch, true HR height or None); the step crops
        outputs/targets back to the true height (see ``pad_h`` in __init__)."""
        if not self.pad_h or self.mesh is None:
            return batch, None
        from ..parallel.mesh import SPATIAL_AXIS, _spatial_key, pad_height_to_multiple

        sp = self.mesh.shape.get(SPATIAL_AXIS, 1)
        if sp <= 1:
            return batch, None
        true_h = int(np.asarray(self._targets(batch)).shape[-3])
        new, padded = dict(batch), False
        for k, v in batch.items():
            arr = np.asarray(v)
            if arr.ndim < 4 or not _spatial_key(k):
                continue
            ext = pad_height_to_multiple(arr, sp)
            if ext is not arr:
                new[k] = ext
                padded = True
        return (new, true_h) if padded else (batch, None)

    def _metric_masks(self, name: str, spatial_shape) -> tuple:
        """Per-metric masks for Cardiac metrics (None elsewhere)."""
        masks = []
        for fn in self.metric_fns:
            if getattr(fn, "requires_name", False):
                masks.append(np.asarray(fn.mask_for(name, spatial_shape)))
            else:
                masks.append(None)
        return tuple(masks)

    # --------------------------------------------------------------- engine
    def _build_step(self):
        if self._step is not None:
            return
        apply_fn = self.net.apply
        weights = jnp.asarray(self.loss_weights)

        kwargs = {"train": False} if self._accepts_train else {}
        cdtype = self.compute_dtype
        mesh = self.mesh

        def score_tail(out, target, masks, out_h):
            """losses + metrics + display denorm from the (assembled) SR
            output — shared by the plain step and the tiled path (which
            passes ONLY the target, not the whole batch: the LR inputs were
            already transferred window-by-window)."""
            if out_h is not None:
                # pad_h: drop the edge-extended rows BEFORE losses/metrics —
                # the padded target rows crop back to exactly the original
                out = out[..., :out_h, :, :]
                target = target[..., :out_h, :, :]
            losses = self._frame_losses(out, target)  # (T, n_loss) or (1, n_loss)
            total = jnp.sum(jnp.mean(losses, axis=0) * weights)
            out_d, tgt_d = self._denorm(out), self._denorm(target)
            metrics = self._frame_metrics(out_d, tgt_d, masks)  # (T, n_metric)
            return total, losses, metrics, out_d

        if self._tile is not None:
            self._step = self._build_tiled_step(score_tail)
            return

        collect_tel = self.telemetry

        @partial(jax.jit, static_argnums=(4,))
        def step(params, state, batch, masks, out_h):
            # ZeRO-3 gather on model-axis meshes (no-op otherwise)
            params = gather_for_compute(mesh, params)
            state = gather_for_compute(mesh, state)
            fwd_batch = batch
            if cdtype is not None:
                params = cast_floating(params, cdtype)
                state = cast_floating(state, cdtype)
                fwd_batch = cast_floating(batch, cdtype)
            variables = {"params": params, **state}
            inputs = self._model_inputs(fwd_batch)
            if collect_tel:
                outputs, tel_vars = apply_fn(
                    variables, *inputs, **kwargs, mutable=["telemetry"]
                )
                tel = dict(tel_vars.get("telemetry", {}))
            else:
                outputs, tel = apply_fn(variables, *inputs, **kwargs), {}
            if cdtype is not None:
                outputs = cast_floating(outputs, jnp.float32)
            return (
                *score_tail(
                    self._select_output(outputs), self._targets(batch), masks, out_h
                ),
                {"telemetry": tel},
            )

        if self.aot_cache:
            from ..utils import aot

            # one executable per argument-shape signature (t_bucket keeps
            # this small); each is AOT-compiled through the disk cache
            step = aot.cached_dispatch(
                step, self.aot_cache, type(self).__name__, static_argnums=(4,)
            )

        self._step = step

    def _build_tiled_step(self, score_tail):
        """The ``tile`` path: one shape-invariant jitted executable for the
        network forward (fixed-size windows via ``ops/tiling.tiled_apply``),
        plus a small per-shape jitted scorer over the assembled frame.  The
        batch stays on HOST (windows are numpy slices, device_put per
        window); the window dispatches pipeline on the device queue before
        the first fetch."""
        from ..ops.tiling import tiled_apply

        apply_fn = self.net.apply
        kwargs = {"train": False} if self._accepts_train else {}
        cdtype = self.compute_dtype
        tile_hw, overlap = self._tile, self._tile_overlap
        collect_tel = self.telemetry

        @jax.jit
        def tile_fwd(params, state, *inputs):
            if cdtype is not None:
                params = cast_floating(params, cdtype)
                state = cast_floating(state, cdtype)
                inputs = cast_floating(inputs, cdtype)
            variables = {"params": params, **state}
            if collect_tel:
                outputs, tel_vars = apply_fn(
                    variables, *inputs, **kwargs, mutable=["telemetry"]
                )
                tel = dict(tel_vars.get("telemetry", {}))
            else:
                outputs, tel = apply_fn(variables, *inputs, **kwargs), {}
            out = self._select_output(outputs)
            return (cast_floating(out, jnp.float32) if cdtype is not None else out), tel

        # exposed for tests: the one-executable-for-any-(H, W) contract is
        # observable as _tile_fwd._cache_size() == 1 after mixed-shape serving
        self._tile_fwd = tile_fwd

        if self.aot_cache:
            from ..utils import aot

            # ONE signature to store — the synergy the tile knob exists for
            tile_fwd = aot.cached_dispatch(
                tile_fwd, self.aot_cache, f"{type(self).__name__}_tile"
            )

        score = partial(jax.jit, static_argnums=(3,))(score_tail)

        def step(params, state, batch, masks, out_h):
            tels = []

            def fwd(*a):
                out, tel = tile_fwd(params, state, *a)
                if tel:
                    tels.append(tel)
                return out

            def probe_fwd(*a):
                # seam-probe windows re-cover regions the main plan already
                # predicted — discard their telemetry so per-item exceedance
                # stats count each sample exactly once
                return tile_fwd(params, state, *a)[0]

            inputs = self._model_inputs(batch)
            if self._want_seam(inputs):
                # per-run seam measurement: adjacent windows disagreeing on
                # their shared overlap bounds the stitched border error
                out, seam = tiled_apply(
                    fwd, inputs, tile_hw, overlap,
                    seam_stats=True, probe_fn=probe_fwd,
                )
            else:
                out, seam = tiled_apply(fwd, inputs, tile_hw, overlap), None
            # fold per-window triples on device (lazy dispatches, no fetch —
            # the summary is fetched once per item in finish())
            tel_acc: dict = {}
            for t in tels:
                tel_acc = (
                    jax.tree.map(telemetry.merge_triples, tel_acc, t) if tel_acc else t
                )
            return (
                *score(out, self._targets(batch), masks, out_h),
                {"telemetry": tel_acc, "seam": seam},
            )

        return step

    def _want_seam(self, inputs) -> bool:
        """Seam-probe policy for this item (``seam_stats`` in __init__):
        "first" probes the first item of each distinct input (H, W) — the
        tile plan, hence the seam layout, is a function of that shape."""
        if self.seam_stats is True:
            return True
        if not self.seam_stats:
            return False
        hw = next(
            (tuple(np.asarray(a).shape[-3:-1]) for a in inputs if np.ndim(a) >= 4),
            None,
        )
        if hw is None or hw in self._seam_probed_shapes:
            return False
        self._seam_probed_shapes.add(hw)
        return True

    def _frame_losses(self, out, target):
        cols = [fn(out, target) for fn in self.loss_fns]
        return jnp.stack(cols)[None, :]  # (1, n_loss)

    def _frame_metrics(self, out, target, masks):
        cols = []
        for fn, mask in zip(self.metric_fns, masks):
            if mask is not None:
                cols.append(fn(out, target, mask=mask))
            else:
                cols.append(fn(out, target))
        return jnp.stack(cols)[None, :]

    def _init_log(self):
        return common.init_log(self.loss_fns, self.metric_fns)

    def _item_meta(self, index: int):
        """(patient, sid, filename) parsed from the dataset path
        (reference ``acdc_sisr_predictor.py:57-59``)."""
        entry = self.test_dataloader.dataset.data[index]
        lr_path = entry[0]
        filename = lr_path.parts[-1].split(".")[0]
        parts = filename.split("_")
        patient, sid = parts[0], parts[2]
        return patient, sid, filename

    def predict(self):
        import time

        self._build_step()
        if self.mesh is not None and self.params is not None:
            # place weights on the mesh (model-axis sharded at rest if any);
            # spatial meshes shard each patient's height axis in shard_batch,
            # scaling SINGLE-patient latency across chips (batch-1 already
            # saturates one chip — PERF_NOTES.md batch sweep)
            self.params = partition_tree(self.mesh, self.params)
            self.model_state = partition_tree(self.mesh, self.model_state)
        log, count = self._init_log(), 0
        results = None
        if self.exported:
            header = (
                ["name"]
                + [fn.name for fn in self.metric_fns]
                + [fn.name for fn in self.loss_fns]
            )
            results = [header]
        frames = 0

        def finish(item):
            """Fetch one dispatched item's results (blocks) and fold them into
            the log / export tree.  Called one item BEHIND the dispatch loop
            so the next item's host prep + device compute overlap this item's
            device→host fetch (the same double-buffering as the trainer's
            ``_device_prefetch``; per-item fetches cost ~33 ms through the
            tunnel — PERF_NOTES).  Export order is preserved: items finish
            strictly in dispatch order, which the SISR GIF assembly relies on."""
            nonlocal frames, count
            total, losses, metrics, out_d, aux, true_T, patient, sid, filename = item
            tel = aux.get("telemetry")
            if tel:
                # one small fetch per item; warn per item (a single patient
                # exceeding the window is the actionable event), aggregate
                # for the run-level summary line
                item_summary = telemetry.summarize(tel)
                telemetry.check(
                    item_summary, self.telemetry_warn_frac, context=filename
                )
                telemetry.merge_summaries(self.telemetry_summary, item_summary)
            seam = aux.get("seam")
            if seam:
                # convert the normalized-output deltas to display units (the
                # denorm is linear: ·std); the "<0.5 dB border-localized"
                # offline characterization becomes a per-item measurement
                rms_d = seam["rms"] * float(np.mean(self.std))
                max_d = seam["max_abs"] * float(np.mean(self.std))
                s = self.seam_summary
                s["max_rms"] = max(s.get("max_rms", 0.0), rms_d)
                s["max_abs"] = max(s.get("max_abs", 0.0), max_d)
                s["items"] = s.get("items", 0) + 1
                LOG.info(
                    f"tile seam [{filename}]: rms={rms_d:.4f} max={max_d:.3f} "
                    f"(display units, {seam['n_probes']} boundary probes)"
                )
            # slice padded frames back off (no-op when true_T is None)
            losses = np.asarray(losses)[:true_T]
            metrics = np.asarray(metrics)[:true_T]
            if true_T is not None:
                out_d = out_d[:, :true_T]
                total = losses.mean(axis=0) @ np.asarray(self.loss_weights)
            T = losses.shape[0]
            frames += T
            if self.exported:
                self._export_item(results, filename, patient, sid, losses, metrics, out_d)
            if self.export_nifti:
                self._export_nifti_item(patient, sid, out_d)
            weight = self.test_dataloader.batch_size * T
            log["Loss"] += float(total) * weight
            for fn, col in zip(self.loss_fns, losses.mean(axis=0)):
                log[fn.name] += float(col) * weight
            for fn, col in zip(self.metric_fns, metrics.mean(axis=0)):
                log[fn.name] += float(col) * weight
            count += weight

        # EVSR_EAGER_EVAL=1 fetches each item before dispatching the next —
        # disables the overlap for debugging/timing (and is the measured-
        # baseline protocol in PERF_NOTES' "Pipelined predictor loop" row)
        pipe = DoubleBuffer(finish, eager=os.environ.get("EVSR_EAGER_EVAL") == "1")
        t0 = time.perf_counter()
        for batch in self.test_dataloader:
            index = int(batch["index"][0])
            patient, sid, filename = self._item_meta(index)
            batch, true_T = self._bucket_batch(batch)
            # masks/meta use the TRUE target shape; padding happens after
            true_shape = np.asarray(self._targets(batch)).shape
            masks = self._metric_masks(patient, true_shape[-3:-1])
            batch, out_h = self._pad_spatial(batch)
            # the tile path windows the HOST batch (numpy slices) itself
            device_batch = batch if self._tile else shard_batch(self.mesh, batch)
            total, losses, metrics, out_d, tel = self._step(
                self.params, self.model_state, device_batch, masks, out_h
            )
            pipe.push(
                (total, losses, metrics, out_d, tel, true_T, patient, sid, filename)
            )
        pipe.drain()
        elapsed = max(time.perf_counter() - t0, 1e-9)
        self.throughput = {"frames_per_sec": frames / elapsed, "frames": frames}
        if self.exported:
            self._finish_export(results)
        if self.export_nifti:
            self._finish_nifti()
        for key in log:
            log[key] /= max(count, 1)
        if self.telemetry_summary:
            LOG.info(
                "Windowed-op telemetry: %s.",
                telemetry.format_summary(self.telemetry_summary),
            )
        if self.seam_summary:
            LOG.info(
                "Tile seam (run max over %d items): rms=%.4f max=%.3f display units.",
                self.seam_summary["items"],
                self.seam_summary["max_rms"],
                self.seam_summary["max_abs"],
            )
        LOG.info(f"Test log: {log}.")
        self.log = log
        return log

    def _export_item(self, results, filename, patient, sid, losses, metrics, out_d):
        raise NotImplementedError

    def _export_nifti_item(self, patient, sid, out_d):
        """Whole-sequence items (VSR family): (1, T, H, W, 1) SR back to the
        source trees' (H, W, 1, T) NIfTI layout, one file per sequence."""
        sr = np.transpose(np.asarray(out_d, np.float32)[0], (1, 2, 3, 0))
        path = (self.saved_dir / "nifti" / patient
                / f"{sid.replace('slice', 'sequence')}.nii.gz")
        nifti.save(sr, path)

    def _finish_nifti(self):
        pass

    def _finish_export(self, results):
        with open(self.saved_dir / "results.csv", "w", newline="") as f:
            csv.writer(f).writerows(results)

    def load(self, path):
        """Restore net weights only (reference ``base_predictor.py:130-136``);
        also accepts genuine PyTorch .pth checkpoints."""
        variables = ckpt_io.load_net_variables(path, type(self.net).__name__)
        # drop any stale telemetry collection (ops/telemetry.strip): init/
        # checkpoint-borne triples must not seed the apply-time reduce
        variables = telemetry.strip(variables)
        self.params = jax.tree.map(jnp.asarray, variables.pop("params", {}))
        self.model_state = jax.tree.map(jnp.asarray, variables)

    def init_params_like(self, batch, rng_key=None):
        """Fresh init (used for Bicubic / tests without a checkpoint)."""
        import jax.random as jr

        key = rng_key if rng_key is not None else jr.PRNGKey(0)
        inputs = jax.tree.map(lambda x: jnp.asarray(x), self._model_inputs(batch))
        kwargs = {"train": False} if self._accepts_train else {}
        # init runs the telemetry sows too — strip the stale collection so
        # it cannot seed the apply-time reduce (ops/telemetry.strip)
        variables = telemetry.strip(self.net.init(key, *inputs, **kwargs))
        self.params = variables.pop("params", {})
        self.model_state = variables


class SISRPredictor(BasePredictor):
    """Reference ``acdc_sisr_predictor.py:15-157``: per-frame CSV rows,
    per-slice GIFs assembled across items, per-frame PNGs."""

    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self._gif_buffer: list = []
        self._gif_key = None
        self._nifti_buffer: list = []
        self._nifti_key = None

    def _model_inputs(self, batch):
        return (batch["lr_img"],)

    def _targets(self, batch):
        return batch["hr_img"]

    def _item_meta(self, index):
        entry = self.test_dataloader.dataset.data[index]
        filename = entry[0].parts[-1].split(".")[0]
        patient, _, sid, fid = filename.split("_")
        return patient, sid, filename

    def _export_item(self, results, filename, patient, sid, losses, metrics, out_d):
        results.append([filename, *metrics.mean(axis=0), *losses.mean(axis=0)])
        sr = np.asarray(out_d)[0, ..., 0].astype(np.uint8)
        key = (patient, sid)
        if self._gif_key is not None and key != self._gif_key and self._gif_buffer:
            self._flush_gif()
        self._gif_buffer.append(sr)
        self._gif_key = key
        imgs_dir = self.saved_dir / "imgs" / patient
        imgs_dir.mkdir(parents=True, exist_ok=True)
        fid = filename.split("_")[-1]
        # MISR sids come from 2d+1d names ('sequenceNN') but PNGs are named
        # by slice (reference acdc_misr_predictor.py:91); SISR sids are
        # already 'sliceNN' so the replace is a no-op there
        _dump_image(imgs_dir / f"{sid.replace('sequence', 'slice')}_{fid}.png", sr)

    def _flush_gif(self):
        patient, sid = self._gif_key
        videos_dir = self.saved_dir / "videos" / patient
        videos_dir.mkdir(parents=True, exist_ok=True)
        _dump_video(videos_dir / f"{sid.replace('slice', 'sequence')}.gif", self._gif_buffer)
        self._gif_buffer = []

    def _export_nifti_item(self, patient, sid, out_d):
        """Frame items: buffer per (patient, slice) in dispatch order (the
        loader is unshuffled, so frames arrive consecutively like the GIF
        assembly relies on) and write the stacked (H, W, 1, T) volume on
        key change."""
        key = (patient, sid)
        if self._nifti_key is not None and key != self._nifti_key and self._nifti_buffer:
            self._flush_nifti()
        self._nifti_buffer.append(np.asarray(out_d, np.float32)[0])
        self._nifti_key = key

    def _flush_nifti(self):
        patient, sid = self._nifti_key
        sr = np.stack(self._nifti_buffer, axis=-1)  # (H, W, 1, T)
        path = (self.saved_dir / "nifti" / patient
                / f"{sid.replace('slice', 'sequence')}.nii.gz")
        nifti.save(sr, path)
        self._nifti_buffer = []

    def _finish_nifti(self):
        if self._nifti_buffer:
            self._flush_nifti()

    def _finish_export(self, results):
        if self._gif_buffer:
            self._flush_gif()
        super()._finish_export(results)


class SISRSRFBPredictor(SISRPredictor):
    """SRFB list outputs: evaluate the last step
    (reference ``acdc_sisr_srfb_predictor.py``)."""

    def _select_output(self, outputs):
        return outputs[-1]


class MISRPredictor(SISRPredictor):
    """Window in, center frame out (reference ``acdc_misr_predictor.py``)."""

    def _model_inputs(self, batch):
        return (batch["lr_imgs"],)

    def _item_meta(self, index):
        lr_path, hr_path, t = self.test_dataloader.dataset.data[index]
        filename = lr_path.parts[-1].split(".")[0]
        patient, _, sid = filename.split("_")
        return patient, sid, f"{filename.replace('2d+1d', '2d').replace('sequence', 'slice')}_frame{t+1:0>2d}"


class VSRPredictor(BasePredictor):
    """Whole-sequence eval: per-frame (T, #) losses/metrics, GIF + PNG export
    (reference ``acdc_vsr_predictor.py:15-180``)."""

    def _model_inputs(self, batch):
        return (batch["lr_imgs"],)

    def _targets(self, batch):
        return batch["hr_imgs"]

    def _bucket_batch(self, batch):
        """Circularly extend the cardiac cycle to the next bucket multiple.

        The sequences are periodic cardiac cycles (the dataset already tiles
        them ×3 — reference ``acdc_vsr_refinenet_dataset.py:74-76``), so the
        pad frames are real wrapped frames: core' = cycle[t mod T], the
        trailing warm-up margin is rebuilt to follow the extended core, and
        scores/exports are sliced back to the true T outside the jit.
        """
        tb = self.t_bucket
        if not tb:
            return batch, None
        hr = np.asarray(batch["hr_imgs"])
        T = hr.shape[1]
        Tb = -(-T // tb) * tb
        if Tb == T:
            return batch, None
        lr = np.asarray(batch["lr_imgs"])
        U = (lr.shape[1] - T) // 2  # warm-up margin (0 for plain VSR)
        idx = np.arange(Tb) % T
        back = np.arange(Tb, Tb + U) % T
        new = dict(batch)
        new["hr_imgs"] = hr[:, idx]
        core = lr[:, U : U + T]
        new["lr_imgs"] = np.concatenate([lr[:, :U], core[:, idx], core[:, back]], axis=1)
        if "pos_code" in batch:
            pos = np.asarray(batch["pos_code"])
            pcore = pos[:, U : U + T]
            new["pos_code"] = np.concatenate(
                [pos[:, :U], pcore[:, idx], pcore[:, back]], axis=1
            )
        return new, T

    def _frame_losses(self, out, target):
        # out/target: (1, T, H, W, C) → per-frame loss columns (T, n_loss)
        cols = [jax.vmap(fn, in_axes=(1, 1))(out, target) for fn in self.loss_fns]
        return jnp.stack(cols, axis=1)

    def _frame_metrics(self, out, target, masks):
        cols = []
        for fn, mask in zip(self.metric_fns, masks):
            if mask is not None:
                cols.append(jax.vmap(lambda o, t: fn(o, t, mask=mask), in_axes=(1, 1))(out, target))
            else:
                cols.append(jax.vmap(fn, in_axes=(1, 1))(out, target))
        return jnp.stack(cols, axis=1)

    def _export_item(self, results, filename, patient, sid, losses, metrics, out_d):
        T = losses.shape[0]
        base = filename.replace("2d+1d", "2d").replace("sequence", "slice")
        for t in range(T):
            results.append([f"{base}_frame{t+1:0>2d}", *metrics[t], *losses[t]])
        sr_imgs = np.asarray(out_d)[0, ..., 0].astype(np.uint8)  # (T, H, W)
        videos_dir = self.saved_dir / "videos" / patient
        videos_dir.mkdir(parents=True, exist_ok=True)
        _dump_video(videos_dir / f"{sid}.gif", list(sr_imgs))
        imgs_dir = self.saved_dir / "imgs" / patient
        imgs_dir.mkdir(parents=True, exist_ok=True)
        for t, sr in enumerate(sr_imgs):
            _dump_image(
                imgs_dir / f"{sid.replace('sequence', 'slice')}_frame{t+1:0>2d}.png", sr
            )


class VSRRefineNetPredictor(VSRPredictor):
    """Feeds (lr, pos_code), evaluates the final fused stage ``outputs[-1]``
    (reference ``acdc_vsr_refinenet_predictor.py:15-183``)."""

    def _model_inputs(self, batch):
        return (batch["lr_imgs"], batch["pos_code"])

    def _select_output(self, outputs):
        return outputs[-1]


class FRVSRPredictor(VSRPredictor):
    """FRVSR returns (sr, warped); evaluate the SR branch."""

    def _select_output(self, outputs):
        return outputs[0] if isinstance(outputs, (tuple, list)) else outputs


def _register(workload: str, cls):
    common.register_dataset_variants(PREDICTORS, workload, "Predictor", cls)


_register("SISR", SISRPredictor)
_register("SISRSRFB", SISRSRFBPredictor)
_register("MISR", MISRPredictor)
_register("VSR", VSRPredictor)
_register("VSRRefineNet", VSRRefineNetPredictor)
_register("FRVSR", FRVSRPredictor)
