"""Trainers: the epoch/step engine (reference ``src/runner/trainers/*``).

TPU redesign of the reference trainer stack (``base_trainer.py:8-252``):

* the whole step — forward, loss, backward, optimizer update, metrics — is
  ONE jitted function with donated (params, opt_state); the reference's
  per-tensor ``.to(device)`` and per-batch ``.item()`` syncs become a single
  sharded device_put per batch and one host transfer of scalar logs.
* data parallelism is SPMD over a 1-D ``data`` mesh: batches sharded on the
  batch axis, params replicated; XLA inserts the psum gradient all-reduce.
* the epoch protocol is kept exactly: per-epoch numpy reseed, train epoch →
  valid epoch → lr step → logger.write → monitor save/best/early-stop
  (``base_trainer.py:46-97``), including the log-weighting convention
  (configured batch_size × T — quirk 8 replicated for parity).

Per-workload trainers collapse the reference's byte-identical ACDC/DSB15
copies into one class parameterized by dataset stats.
"""
from __future__ import annotations

import inspect
import logging
import os
import time
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TRAINERS
from ..ops import telemetry
from ..parallel import gather_for_compute, partition_tree, shard_batch
from ..utils.casting import cast_floating
from ..utils.profiling import trace
from ..utils.seeding import SeedState, seed_everything
from ..utils.stats import get_stats
from . import checkpoint as ckpt_io
from . import common

LOG = logging.getLogger(__name__)


def _per_frame_metric(fn, outputs, targets):
    """Per-frame metric over (B, T, ...) arrays, averaged over T —
    the reference computes metrics frame-by-frame then means
    (``acdc_vsr_trainer.py:83-107``); PSNR/SSIM are nonlinear so order matters."""
    vals = jax.vmap(fn, in_axes=(1, 1))(outputs, targets)
    return jnp.mean(vals)


class BaseTrainer:
    """Config surface mirrors the reference BaseTrainer kwargs."""

    #: dataset whose stats denormalize metric inputs; set via registration name
    dataset_stats = "acdc"

    def __init__(
        self,
        device=None,
        train_dataloader=None,
        valid_dataloader=None,
        net=None,
        loss_fns=None,
        loss_weights=None,
        metric_fns=None,
        optimizer=None,
        lr_scheduler=None,
        logger=None,
        monitor=None,
        num_epochs=1,
        mesh=None,
        seed_state: SeedState | None = None,
        dataset_stats: str | None = None,
        checkpoint_backend: str = "pickle",
        compute_dtype: str | None = None,
        grad_accum_steps: int = 1,
        aot_cache: str | None = None,
        int_feed: bool = False,
        telemetry: bool = True,
        telemetry_warn_frac: float = 0.0,
        preempt_after_epochs: int = 0,
        preempt_after_seconds: float = 0.0,
    ):
        self.device = device
        self.mesh = mesh
        self.train_dataloader = train_dataloader
        self.valid_dataloader = valid_dataloader
        self.net = net
        self.loss_fns = list(loss_fns or [])
        self.loss_weights = np.asarray(loss_weights if loss_weights is not None else [1.0] * len(self.loss_fns), np.float32)
        self.metric_fns = list(metric_fns or [])
        self.optimizer = optimizer
        self.lr_scheduler = lr_scheduler
        self.logger = logger
        self.monitor = monitor
        self.num_epochs = num_epochs
        self.checkpoint_backend = checkpoint_backend
        # TPU extension (no reference counterpart): forward/backward in bf16
        # while params, optimizer state and losses stay f32 (bf16 needs no
        # loss scaling; PSNR impact measured at <0.2 gray levels -
        # PERF_NOTES.md round-1 probe).
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None
        # TPU extension (no reference counterpart): split each batch into N
        # equal microbatches inside the jitted step (lax.scan) and average
        # their gradients before ONE optimizer update.  Losses are per-item
        # means, so the averaged gradient equals the full-batch gradient
        # exactly; it exists because very large per-step graphs (e.g. the
        # EDVR batch-16 backward) can exceed compiler limits that the
        # batch-(16/N) graph does not (PERF_NOTES.md 'Deformable conv').
        # Metrics are averaged over microbatches (nonlinear metrics like PSNR
        # thereby average at microbatch granularity); BN batch_stats update
        # sequentially per microbatch.
        self.grad_accum_steps = max(1, int(grad_accum_steps))
        # TPU extension: persistent AOT *executable* cache (utils/aot.py) —
        # a preemption-resume restart skips the multi-minute train-step
        # compile that jax's persistent compilation cache does not avoid on
        # the tunneled backend.  EVSR_AOT_CACHE provides it environment-wide.
        self.aot_cache = aot_cache or os.environ.get("EVSR_AOT_CACHE") or None
        # TPU extension (no reference counterpart): lossless integer-dtype
        # device feed.  The datasets' explicit-stats Normalize moves ON
        # DEVICE (popped off the host pipeline) so batches travel in the
        # source intensity scale, where the integer-valued HR trees compact
        # to uint8 — 4x less H2D traffic.  Built for tunneled/remote-host
        # chips whose upload bandwidth, not compute, bounds the step rate
        # (PERF_NOTES.md "E2E training ... H2D-upload-bound"); a no-op when
        # no explicit-stats Normalize exists to defer.
        self.int_feed = bool(int_feed)
        self._feed_norm = None
        if self.int_feed:
            self._resolve_int_feed()
        self.epoch = 1
        if dataset_stats:
            self.dataset_stats = dataset_stats
        self.mean, self.std = get_stats(self.dataset_stats)
        self.seed_state = seed_state or seed_everything("vsr", num_epochs)
        if not self.seed_state.np_random_seeds:
            self.seed_state = seed_everything(self.seed_state.seed, num_epochs)

        self.params = None
        self.opt_state = None
        self.model_state = {}  # extra collections (e.g. batch_stats for BN nets)
        self._accepts_train = common.accepts_train_kwarg(net)
        self._train_step = None
        self._eval_step = None
        self.throughput = {"train_steps_per_sec": 0.0, "frames_per_sec": 0.0}
        # per-epoch train/valid logs, in order — consumed by the verbatim-train
        # runbook (tools/verbatim_train_tpu.py) and loss-trajectory tests
        self.history = {"train": [], "valid": []}
        # Training-time windowed-approximation telemetry (ops/telemetry.py):
        # when the net TRAINS with a max_flow / dcn_max_offset knob, an
        # out-of-window displacement silently changes the learned model (the
        # reference trains with exact-anywhere sampling —
        # deform_conv_cuda_kernel.cu:83-188, toflow_net.py:116-138).  The
        # train step stays telemetry-free (the sows are dead code there; the
        # backward is the hot path), but every VALIDATION epoch — whose
        # forward already runs — collects the collection and logs the
        # per-epoch out-of-window fraction + max displacement, warning with
        # the same remedy text as the predictors.  Nets without the knobs sow
        # nothing and pay nothing.
        self.telemetry = bool(telemetry)
        self.telemetry_warn_frac = float(telemetry_warn_frac)
        self.telemetry_summary: dict = {}       # run aggregate across epochs
        self.telemetry_history: list[dict] = []  # per-valid-epoch summaries
        # TPU extension (SURVEY §5 failure recovery): epoch- or wall-clock-
        # budgeted self-preemption for scheduled maintenance windows /
        # bounded job slots — once the budget is hit at an epoch boundary,
        # take exactly the SIGTERM preemption path (checkpoint
        # model_preempted.pth, clean exit); ``loaded_path: auto`` then
        # resumes the same trajectory.  0 = off.  The seconds budget is
        # checked AFTER each epoch, so size it one epoch short of the slot.
        self.preempt_after_epochs = int(preempt_after_epochs)
        self.preempt_after_seconds = float(preempt_after_seconds)

    # ------------------------------------------------------------- workload
    # Traced (pure) methods each workload overrides.
    def _model_inputs(self, batch) -> tuple:
        raise NotImplementedError

    def _targets(self, batch):
        raise NotImplementedError

    def _compute_losses(self, outputs, batch, training: bool) -> list:
        raise NotImplementedError

    def _compute_metrics(self, outputs, batch) -> list:
        raise NotImplementedError

    def _display_outputs(self, outputs):
        """Output array handed to the logger (last batch only)."""
        return outputs

    def _log_weight(self, batch, mode: str) -> float:
        """Reference weighting: configured batch_size (quirk 8)."""
        loader = self.train_dataloader if mode == "training" else self.valid_dataloader
        return loader.batch_size

    def _denorm(self, x):
        return common.denorm_uint8(x, self.mean, self.std)

    # ------------------------------------------------------------- int_feed
    def _resolve_int_feed(self):
        """Move the datasets' explicit-stats Normalize on device, if possible.

        Multi-process meshes must all trace the SAME step signature; the
        feed dtype is data-dependent (per-batch lossless guard), so the knob
        only engages single-process.
        """
        if jax.process_count() > 1:
            LOG.warning(
                "int_feed disabled: the compacted feed dtype is data-dependent "
                "and multi-process traces must agree on one signature."
            )
            self.int_feed = False
            return
        datasets = [
            getattr(loader, "dataset", None)
            for loader in (self.train_dataloader, self.valid_dataloader)
            if loader is not None
        ]
        probes = [
            ds.deferrable_normalize() if hasattr(ds, "deferrable_normalize") else None
            for ds in datasets
        ]
        if not probes or any(p is None for p in probes):
            LOG.warning(
                "int_feed disabled: every dataset needs an explicit-stats "
                "Normalize transform to defer to the device."
            )
            self.int_feed = False
            return
        if any(p != probes[0] for p in probes):
            raise ValueError(
                f"int_feed: train/valid Normalize stats differ ({probes})."
            )
        means, stds = probes[0]
        for ds in datasets:
            ds.defer_normalize()
        # match the host op exactly: numpy computes (std + 1e-10) in python
        # float64 first, then weak-casts the scalar to the array's float32
        self._feed_norm = (
            np.asarray(means, np.float32),
            np.asarray([np.float64(s) + 1e-10 for s in stds], np.float32),
        )

    def _feed_normalize(self, batch):
        """The deferred Normalize, applied on device (f32) to every image
        key; compact integer feeds cast up exactly first.  Traced into the
        step functions — and run eagerly once by ``init_params``."""
        if self._feed_norm is None:
            return batch
        means, divs = self._feed_norm
        out = dict(batch)
        for k, v in batch.items():
            if isinstance(k, str) and "img" in k:
                out[k] = (jnp.asarray(v, jnp.float32) - means) / divs
        return out

    def _compact_feed(self, batch):
        """Host side of ``int_feed``: shrink image arrays to uint8/int16 for
        the transfer when provably lossless (per-batch guard).

        bf16 LR wire (the int_feed extension for ``compute_dtype: bfloat16``):
        float LR inputs that fail the lossless integer guard (the k-space-
        degraded LR trees are fractional) ship as bfloat16 instead of float32
        — the forward casts every model input to bf16 anyway
        (``forward_losses``), so full wire precision is unobservable beyond
        the rounding point: the shipped value differs from the f32 path's
        by <= 1 bf16 ulp OF THE INPUT (rounding before the on-device f32
        Normalize instead of after the cast at compute).  Targets (``hr_*``)
        are never bf16-compressed — losses compare f32 outputs against f32
        targets on both paths."""
        if self._feed_norm is None:
            return batch
        bf16_wire = self.compute_dtype == jnp.bfloat16
        out = {}
        for k, v in batch.items():
            if isinstance(k, str) and "img" in k:
                v = common.compact_lossless(np.asarray(v))
                if (
                    bf16_wire
                    and "lr" in k
                    and isinstance(v, np.ndarray)
                    and v.dtype == np.float32
                ):
                    v = v.astype(jnp.bfloat16)
            out[k] = v
        return out

    # --------------------------------------------------------------- engine
    def init_params(self, batch, rng_key=None):
        if self.params is not None:
            return
        batch = self._feed_normalize(batch)
        key = rng_key if rng_key is not None else self.seed_state.jax_key()
        inputs = jax.tree.map(lambda x: jnp.asarray(x), self._model_inputs(batch))
        kwargs = {"train": False} if self._accepts_train else {}
        variables = self.net.init(key, *inputs, **kwargs)
        # init runs the windowed-op telemetry sows too — keep the stale
        # collection out of model_state/checkpoints (ops/telemetry.strip)
        variables = telemetry.strip(variables)
        # commit to the mesh: params tensor-parallel over the model axis when
        # the mesh has one (kernels sharded on out-features), replicated
        # otherwise; opt_state mirrors the param shapes so the same specs fit
        self.params = partition_tree(self.mesh, variables.pop("params", {}))
        self.model_state = partition_tree(self.mesh, variables)
        if self.optimizer is not None:
            self.opt_state = partition_tree(self.mesh, self.optimizer.init(self.params))

    def _build_steps(self):
        if self._train_step is not None:
            return
        weights = jnp.asarray(self.loss_weights)
        apply_fn = self.net.apply

        accepts_train = self._accepts_train

        cdtype = self.compute_dtype

        mesh = self.mesh

        def forward_losses(params, state, batch, training, collect_tel=False):
            # ZeRO-3 gather point: params live model-axis sharded at rest;
            # compute sees full kernels (see parallel/mesh.py on why convs
            # must not mix spatial halos with feature-sharded kernels)
            params = gather_for_compute(mesh, params)
            state = gather_for_compute(mesh, state)
            # cast ONLY the model inputs — the batch (loss/metric targets)
            # stays f32 so losses compare f32 outputs against f32 targets
            # (mirrors the predictor's fwd_batch/batch split)
            fwd_inputs = self._model_inputs(batch)
            if cdtype is not None:
                params = cast_floating(params, cdtype)
                state = cast_floating(state, cdtype)
                fwd_inputs = cast_floating(fwd_inputs, cdtype)
            variables = {"params": params, **state}
            kwargs = {"train": training} if accepts_train else {}
            tel = {}
            if state and training:
                outputs, new_state = apply_fn(
                    variables, *fwd_inputs, mutable=list(state.keys()), **kwargs
                )
            elif collect_tel:
                # validation-epoch telemetry: the sows are live here (and
                # ONLY here on the trainer — the train step never collects)
                outputs, tel_vars = apply_fn(
                    variables, *fwd_inputs, mutable=[telemetry.COLLECTION], **kwargs
                )
                tel = dict(tel_vars.get(telemetry.COLLECTION, {}))
                new_state = state
            else:
                outputs = apply_fn(variables, *fwd_inputs, **kwargs)
                new_state = state
            if cdtype is not None:
                outputs = cast_floating(outputs, jnp.float32)
                # batch_stats updates are computed in bf16 under the knob,
                # then carried as f32 masters
                new_state = cast_floating(new_state, jnp.float32)
            losses = self._compute_losses(outputs, batch, training)
            total = jnp.sum(jnp.stack(losses) * weights)
            return total, (losses, outputs, new_state, tel)

        accum = self.grad_accum_steps

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_step(params, opt_state, state, batch):
            batch = self._feed_normalize(batch)  # no-op unless int_feed
            if accum <= 1:
                (total, (losses, outputs, state, _)), grads = jax.value_and_grad(
                    forward_losses, has_aux=True
                )(params, state, batch, True)
                metrics = self._compute_metrics(outputs, batch)
            else:
                # (B, ...) -> (A, B/A, ...): lax.scan over microbatches keeps
                # the compiled graph at batch-B/A size while the averaged
                # gradient equals the full-batch gradient (per-item-mean
                # losses).  Grads/scalars accumulate in the carry — no A-fold
                # stacking of gradients.
                b = jax.tree.leaves(batch)[0].shape[0]
                if b % accum:
                    raise ValueError(
                        f"grad_accum_steps={accum} must divide the batch "
                        f"size; got batch {b}. Adjust train_batch_size or "
                        "drop_last."
                    )
                micro = jax.tree.map(
                    lambda x: x.reshape((accum, x.shape[0] // accum) + x.shape[1:]),
                    batch,
                )
                zero_grads = jax.tree.map(jnp.zeros_like, params)

                def body(carry, mb):
                    state, grads_acc, total_acc, losses_acc, metrics_acc = carry
                    (total, (losses, outputs, state, _)), grads = jax.value_and_grad(
                        forward_losses, has_aux=True
                    )(params, state, mb, True)
                    metrics = self._compute_metrics(outputs, mb)
                    carry = (
                        state,
                        jax.tree.map(jnp.add, grads_acc, grads),
                        total_acc + total,
                        [a + l for a, l in zip(losses_acc, losses)],
                        [a + m for a, m in zip(metrics_acc, metrics)],
                    )
                    return carry, self._display_outputs(outputs)

                n_losses = len(self.loss_fns)
                n_metrics = len(self.metric_fns)
                carry0 = (
                    state,
                    zero_grads,
                    jnp.zeros(()),
                    [jnp.zeros(())] * n_losses,
                    [jnp.zeros(())] * n_metrics,
                )
                (state, grads, total, losses, metrics), outs = jax.lax.scan(
                    body, carry0, micro
                )
                inv = 1.0 / accum
                grads = jax.tree.map(lambda g: g * inv, grads)
                total = total * inv
                losses = [l * inv for l in losses]
                metrics = [m * inv for m in metrics]
                # (A, B/A, ...) -> (B, ...): display outputs cover the FULL
                # batch (the logger pairs them with the full host batch)
                outputs = jax.tree.map(
                    lambda o: o.reshape((-1,) + o.shape[2:]), outs
                )
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            if accum > 1:
                return params, opt_state, state, total, losses, metrics, outputs
            return params, opt_state, state, total, losses, metrics, self._display_outputs(outputs)

        collect_tel = self.telemetry

        @jax.jit
        def eval_step(params, state, batch):
            batch = self._feed_normalize(batch)  # no-op unless int_feed
            total, (losses, outputs, _, tel) = forward_losses(
                params, state, batch, False, collect_tel
            )
            metrics = self._compute_metrics(outputs, batch)
            return total, losses, metrics, self._display_outputs(outputs), tel

        if self.aot_cache:
            from ..utils import aot

            tag = type(self).__name__
            train_step = aot.cached_dispatch(train_step, self.aot_cache, f"{tag}-train")
            eval_step = aot.cached_dispatch(eval_step, self.aot_cache, f"{tag}-eval")

        self._train_step = train_step
        self._eval_step = eval_step

    def _init_log(self):
        return common.init_log(self.loss_fns, self.metric_fns)

    def _device_prefetch(self, loader, lookahead: int = 1):
        """Double-buffered host→device pipeline (SURVEY §7): the next batch is
        prepared by the loader and transferred (async ``device_put``) while
        the current step runs on device.  Yields (host_batch, device_batch)."""
        buf = deque()
        for batch in loader:
            buf.append((batch, shard_batch(self.mesh, self._compact_feed(batch))))
            if len(buf) > lookahead:
                yield buf.popleft()
        while buf:
            yield buf.popleft()

    def _run_epoch(self, mode: str):
        loader = self.train_dataloader if mode == "training" else self.valid_dataloader
        count = 0
        batch = outputs = None
        steps = 0
        # log accumulators stay ON DEVICE for the whole epoch: fetching per
        # step (float()) would sync the pipeline every batch and serialize
        # host and device.  One transfer at epoch end instead.
        acc_total = acc_losses = acc_metrics = None
        tel_acc: dict = {}
        frames = 0
        t0 = time.perf_counter()
        for batch, device_batch in self._device_prefetch(loader):
            if self.params is None:
                self.init_params(device_batch)
            self._build_steps()  # no-op once built
            if mode == "training":
                (
                    self.params,
                    self.opt_state,
                    self.model_state,
                    total,
                    losses,
                    metrics,
                    outputs,
                ) = self._train_step(self.params, self.opt_state, self.model_state, device_batch)
            else:
                total, losses, metrics, outputs, tel = self._eval_step(
                    self.params, self.model_state, device_batch
                )
                if tel:
                    # fold per-batch triples on device (lazy dispatches, no
                    # fetch); ONE summarize transfer at epoch end
                    tel_acc = (
                        jax.tree.map(telemetry.merge_triples, tel_acc, tel)
                        if tel_acc
                        else tel
                    )
            w = float(self._log_weight(batch, mode))
            if acc_total is None:
                acc_total = total * w
                acc_losses = [l * w for l in losses]
                acc_metrics = [m * w for m in metrics]
            else:
                acc_total = acc_total + total * w
                acc_losses = [a + l * w for a, l in zip(acc_losses, losses)]
                acc_metrics = [a + m * w for a, m in zip(acc_metrics, metrics)]
            count += w
            steps += 1
            # LR frames consumed this step: (B, T, ...) video or (B, ...) image
            imgs = batch.get("lr_imgs")
            if imgs is not None:
                frames += int(imgs.shape[0] * imgs.shape[1])
            elif batch.get("lr_img") is not None:
                frames += int(batch["lr_img"].shape[0])
        log = self._init_log()
        if acc_total is not None:
            log["Loss"] = float(acc_total)
            for fn, val in zip(self.loss_fns, acc_losses):
                log[fn.name] = float(val)
            for fn, val in zip(self.metric_fns, acc_metrics):
                log[fn.name] = float(val)
        # elapsed measured after the log fetch so it includes device drain
        elapsed = max(time.perf_counter() - t0, 1e-9)
        if mode == "training" and steps:
            self.throughput["train_steps_per_sec"] = steps / elapsed
            self.throughput["frames_per_sec"] = frames / elapsed
        for key in log:
            log[key] /= max(count, 1)
        if tel_acc:
            summary = telemetry.summarize(tel_acc)
            if summary:
                telemetry.check(
                    summary,
                    self.telemetry_warn_frac,
                    context=f"valid epoch {self.epoch}",
                )
                telemetry.merge_summaries(self.telemetry_summary, summary)
                self.telemetry_history.append(summary)
                LOG.info(
                    "Windowed-op telemetry (valid epoch %d): %s.",
                    self.epoch,
                    telemetry.format_summary(summary),
                )
        return log, batch, outputs

    def train(self):
        """Epoch protocol of reference ``base_trainer.py:46-97``.

        Preemption-safe (TPU extension, SURVEY §5 failure recovery): SIGTERM
        requests a checkpoint at the end of the current epoch and a clean
        exit; ``loaded_path: auto`` then resumes from it.
        """
        import signal

        self._preempt_requested = False

        def _on_term(signum, frame):
            self._preempt_requested = True
            LOG.warning(
                "SIGTERM received: checkpointing and exiting at the end of this epoch."
            )

        prev_handler = None
        try:
            prev_handler = signal.signal(signal.SIGTERM, _on_term)
        except ValueError:
            pass  # not the main thread (e.g. embedded) — no handler
        try:
            self._train_loop()
        finally:
            if prev_handler is not None:
                signal.signal(signal.SIGTERM, prev_handler)

    def _train_loop(self):
        epochs_this_run = 0
        run_t0 = time.perf_counter()
        while self.epoch <= self.num_epochs:
            seeds = self.seed_state.np_random_seeds
            while self.epoch - 1 >= len(seeds):
                # resume trained past the original num_epochs (the reference
                # would IndexError here): extend deterministically
                seeds.append((self.seed_state.base_int + 7919 * len(seeds)) % 10000000)
            np.random.seed(seeds[self.epoch - 1] % (2**32))
            for loader in (self.train_dataloader, self.valid_dataloader):
                if hasattr(loader, "set_epoch"):
                    loader.set_epoch(seeds[self.epoch - 1])
            LOG.info(f"Epoch {self.epoch}.")
            with trace(f"train_epoch_{self.epoch}"):
                train_log, train_batch, train_outputs = self._run_epoch("training")
            LOG.info(
                f"Train log: {train_log} "
                f"({self.throughput['train_steps_per_sec']:.2f} steps/sec)."
            )
            if self.optimizer is not None and getattr(self.optimizer, "skip_nonfinite", 0):
                skipped = self.optimizer.check_nonfinite(self.opt_state)  # raises on divergence
                if skipped:
                    LOG.warning(f"{skipped} non-finite gradient steps skipped so far.")
            with trace(f"valid_epoch_{self.epoch}"):
                valid_log, valid_batch, valid_outputs = self._run_epoch("validation")
            LOG.info(f"Valid log: {valid_log}.")
            self.history["train"].append(dict(train_log))
            self.history["valid"].append(dict(valid_log))

            if self.lr_scheduler is not None:
                new_lr = self.lr_scheduler.step(valid_log.get("Loss"))
                self.opt_state = self.optimizer.set_lr(self.opt_state, new_lr)

            if self.logger is not None:
                self._write_logs(
                    train_log, train_batch, train_outputs,
                    valid_log, valid_batch, valid_outputs,
                )

            saved_path = self.monitor.is_saved(self.epoch) if self.monitor else None
            if saved_path:
                LOG.info(f"Save the checkpoint to {saved_path}.")
                self.save(saved_path)
            saved_path = self.monitor.is_best(valid_log) if self.monitor else None
            if saved_path:
                LOG.info(
                    f"Save the best checkpoint to {saved_path} "
                    f"({self.monitor.mode} {self.monitor.target}: {self.monitor.best})."
                )
                self.save(saved_path)

            if self.monitor and self.monitor.is_early_stopped():
                LOG.info("Early stopped.")
                break
            epochs_this_run += 1
            if self.epoch < self.num_epochs:
                if (
                    self.preempt_after_epochs
                    and epochs_this_run >= self.preempt_after_epochs
                ):
                    LOG.info(
                        "Epoch budget reached (%d this run): self-preempting.",
                        epochs_this_run,
                    )
                    self._preempt_requested = True
                elif (
                    self.preempt_after_seconds
                    and time.perf_counter() - run_t0 >= self.preempt_after_seconds
                ):
                    LOG.info(
                        "Wall-clock budget reached (%.0f s this run): "
                        "self-preempting.",
                        time.perf_counter() - run_t0,
                    )
                    self._preempt_requested = True
            if self._preempt_requested:
                if self.monitor:
                    path = self.monitor.checkpoints_dir / "model_preempted.pth"
                    self.save(path)
                    LOG.info(f"Preemption checkpoint saved to {path}; exiting.")
                break
            self.epoch += 1
        # commit barrier for orbax_async saves: nothing may exit the loop
        # with a checkpoint still streaming to disk (no-op otherwise)
        ckpt_io.wait_for_async_saves()
        if self.logger is not None:
            self.logger.close()

    def _write_logs(self, train_log, train_batch, train_outputs,
                    valid_log, valid_batch, valid_outputs):
        """Epoch TensorBoard write.  Display outputs may be sharded over a
        data axis spanning processes (multi-host), where a bare np.asarray
        raises on non-addressable shards; ``ckpt_io._to_numpy`` reshards to
        replicated first — a collective, so EVERY process must run the
        gather — and only the lead writes (one SummaryWriter per log dir)."""
        train_np = ckpt_io._to_numpy(train_outputs) if train_outputs is not None else None
        valid_np = ckpt_io._to_numpy(valid_outputs) if valid_outputs is not None else None
        if jax.process_index() == 0:
            self.logger.write(
                self.epoch, train_log, train_batch, train_np,
                valid_log, valid_batch, valid_np,
            )

    # ----------------------------------------------------------- checkpoint
    def save(self, path):
        ckpt_io.save_checkpoint(
            path,
            params=self.params,
            model_state=self.model_state,
            opt_state=self.opt_state,
            lr_scheduler_state=self.lr_scheduler.state_dict() if self.lr_scheduler else None,
            monitor_state=self.monitor.state_dict() if self.monitor else None,
            epoch=self.epoch,
            seed_state=self.seed_state,
            backend=self.checkpoint_backend,
        )

    def load(self, path):
        ckpt = ckpt_io.load_checkpoint(path)
        self.params = partition_tree(self.mesh, jax.tree.map(jnp.asarray, ckpt["net"]))
        if ckpt.get("model_state"):
            self.model_state = partition_tree(
                self.mesh, jax.tree.map(jnp.asarray, ckpt["model_state"])
            )
        if ckpt.get("optimizer") is not None:
            restored = ckpt["optimizer"]
            if self.optimizer is not None and isinstance(restored, (dict, list)):
                # orbax restores degrade namedtuple optax states to dicts;
                # rebuild onto the real state structure.  Gated on the
                # degradation so pickle checkpoints (which preserve the
                # namedtuples) skip the optimizer.init structure allocation
                restored = ckpt_io.coerce_like(self.optimizer.init(self.params), restored)
            self.opt_state = partition_tree(
                self.mesh,
                jax.tree.map(
                    lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x,
                    restored,
                ),
            )
        if self.lr_scheduler is not None and ckpt.get("lr_scheduler"):
            self.lr_scheduler.load_state_dict(ckpt["lr_scheduler"])
        if self.monitor is not None and ckpt.get("monitor"):
            self.monitor.load_state_dict(ckpt["monitor"])
        self.epoch = (ckpt.get("epoch") or 0) + 1
        if ckpt.get("seed_state") is not None:
            self.seed_state = ckpt["seed_state"]
        self._build_steps_after_load()

    def _build_steps_after_load(self):
        # params exist; steps rebuild lazily on the next batch
        self._train_step = None
        self._eval_step = None


class SISRTrainer(BaseTrainer):
    """Single-image SR (reference ``acdc_sisr_trainer.py:8-49``)."""

    def _model_inputs(self, batch):
        return (batch["lr_img"],)

    def _targets(self, batch):
        return batch["hr_img"]

    def _compute_losses(self, outputs, batch, training):
        t = self._targets(batch)
        return [fn(outputs, t) for fn in self.loss_fns]

    def _compute_metrics(self, outputs, batch):
        o, t = self._denorm(outputs), self._denorm(self._targets(batch))
        return [fn(o, t) for fn in self.metric_fns]


class SISRSRFBTrainer(SISRTrainer):
    """SRFB feedback net: list of per-step outputs; loss = mean over steps,
    metrics on the last step (reference ``acdc_sisr_srfb_trainer.py:6-39``)."""

    def _compute_losses(self, outputs, batch, training):
        t = self._targets(batch)
        return [jnp.mean(jnp.stack([fn(o, t) for o in outputs])) for fn in self.loss_fns]

    def _compute_metrics(self, outputs, batch):
        o, t = self._denorm(outputs[-1]), self._denorm(self._targets(batch))
        return [fn(o, t) for fn in self.metric_fns]

    def _display_outputs(self, outputs):
        return outputs[-1]


class MISRTrainer(BaseTrainer):
    """Window in, center frame out (reference ``acdc_misr_trainer.py:8-49``)."""

    def _model_inputs(self, batch):
        return (batch["lr_imgs"],)

    def _targets(self, batch):
        return batch["hr_img"]

    def _compute_losses(self, outputs, batch, training):
        t = self._targets(batch)
        return [fn(outputs, t) for fn in self.loss_fns]

    def _compute_metrics(self, outputs, batch):
        o, t = self._denorm(outputs), self._denorm(self._targets(batch))
        return [fn(o, t) for fn in self.metric_fns]


class VSRTrainer(BaseTrainer):
    """Sequence in, sequence out; logs weighted by B·T and per-frame metrics
    (reference ``acdc_vsr_trainer.py:9-123``)."""

    def _model_inputs(self, batch):
        return (batch["lr_imgs"],)

    def _targets(self, batch):
        return batch["hr_imgs"]

    def _log_weight(self, batch, mode):
        return super()._log_weight(batch, mode) * batch["lr_imgs"].shape[1]

    def _compute_losses(self, outputs, batch, training):
        t = self._targets(batch)
        return [fn(outputs, t) for fn in self.loss_fns]

    def _compute_metrics(self, outputs, batch):
        o, t = self._denorm(outputs), self._denorm(self._targets(batch))
        return [_per_frame_metric(fn, o, t) for fn in self.metric_fns]


class VSRRefineNetTrainer(VSRTrainer):
    """RefineNet: stage-discounted multi-branch loss
    (reference ``acdc_vsr_refinenet_trainer.py:10-136``).

    Training loss per loss_fn = Σ over the 3·num_stages branches of
    ``0.5^(num_stages − 1 − branch//3) · mean(per-frame loss)``; eval loss and
    all metrics use only the final fused branch ``outputs[-1]``.
    """

    def _model_inputs(self, batch):
        return (batch["lr_imgs"], batch["pos_code"])

    def _compute_losses(self, outputs, batch, training):
        t = self._targets(batch)
        if training:
            num_stages = len(outputs) // 3
            losses = []
            for fn in self.loss_fns:
                branch_losses = [
                    fn(o, t) * (0.5 ** (num_stages - i // 3 - 1))
                    for i, o in enumerate(outputs)
                ]
                losses.append(jnp.sum(jnp.stack(branch_losses)))
            return losses
        return [fn(outputs[-1], t) for fn in self.loss_fns]

    def _compute_metrics(self, outputs, batch):
        o, t = self._denorm(outputs[-1]), self._denorm(self._targets(batch))
        return [_per_frame_metric(fn, o, t) for fn in self.metric_fns]

    def _display_outputs(self, outputs):
        return outputs[-1]


class FRVSRTrainer(VSRTrainer):
    """Frame-recurrent VSR: FlowLoss on warped LR, SR loss on outputs
    (reference ``acdc_frvsr_trainer.py:9-124``)."""

    def _compute_losses(self, outputs, batch, training):
        sr_imgs, lr_warped = outputs
        lr_imgs = batch["lr_imgs"]
        t = self._targets(batch)
        losses = []
        for fn in self.loss_fns:
            if fn.name == "FlowLoss":
                # warped previous LR vs current LR, same index
                # (reference acdc_frvsr_trainer.py:86)
                losses.append(fn(lr_warped, lr_imgs))
            else:
                losses.append(fn(sr_imgs, t))
        return losses

    def _compute_metrics(self, outputs, batch):
        o, t = self._denorm(outputs[0]), self._denorm(self._targets(batch))
        return [_per_frame_metric(fn, o, t) for fn in self.metric_fns]

    def _display_outputs(self, outputs):
        return outputs[0]


# Register ACDC/DSB15 twins with their stats baked in.
def _register(workload: str, cls):
    common.register_dataset_variants(TRAINERS, workload, "Trainer", cls)


_register("SISR", SISRTrainer)
_register("SISRSRFB", SISRSRFBTrainer)
_register("MISR", MISRTrainer)
_register("VSR", VSRTrainer)
_register("VSRRefineNet", VSRRefineNetTrainer)
_register("FRVSR", FRVSRTrainer)
