"""Composition root: run training or testing from a YAML config.

Drop-in equivalent of the reference CLI (``src/main.py:19-167``):

    python -m efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main CONFIG [--test]

The reference's ``configs/train|test/**.yaml`` files load unchanged: the same
12 sections, the same ``{name, kwargs}`` component blocks, the same seeding
entry points.  Device strings like ``'cuda:0'`` are mapped to the available
JAX backend (TPU if present, else CPU) — the configs stay portable.

Optional extension section (absent from reference configs, defaulted off):

    parallel:
        num_devices: 8      # mesh size (default: all devices)
        spatial_parallel: 2 # shard the image height axis (halo via GSPMD)
        model_parallel: 2   # tensor-parallel conv kernels (out-features)
        pad_h: true         # edge-extend indivisible heights so they still
                            # shard (prediction; outputs cropped in-step)
        # data-parallel size = num_devices / (spatial x model)

"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path

from .config import (
    DATALOADERS,
    DATASETS,
    LOGGERS,
    LOSSES,
    METRICS,
    MONITORS,
    PREDICTORS,
    TRAINERS,
    Cfg,
    load_config,
)
from .utils.seeding import seed_everything

logger = logging.getLogger(__name__)


def _import_components():
    # populate the registries
    from . import data, losses, metrics, models  # noqa: F401
    from .runner import loggers, monitor, predictors, trainers  # noqa: F401


def _pin_backend_config(device_str: str | None, num_cpu_devices: int | None = None):
    """Pure ``jax.config`` pins, touching NO backend state — must run before
    BOTH :func:`_init_distributed` (whose process_index/count calls bring the
    backend up) and any device query.

    ``device: 'cpu'`` configs pin jax to CPU (the environment's TPU plugin
    self-registers, so the config must override it explicitly — BASELINE
    config #1 demands CPU inference).  ``num_cpu_devices`` self-provisions a
    virtual CPU mesh for ``parallel:`` configs run on CPU (no XLA_FLAGS
    needed — same mechanism as ``dryrun_multichip``)."""
    import jax

    if device_str and device_str.startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
            if num_cpu_devices and num_cpu_devices > 1:
                jax.config.update("jax_num_cpu_devices", int(num_cpu_devices))
        except RuntimeError:
            pass  # backend already up (library/test use) — make_mesh reports
            # a clear error if the devices don't suffice


def resolve_device(device_str: str | None, num_cpu_devices: int | None = None):
    """Map the reference's ``'cuda:0'`` strings to the JAX backend (pinning
    via :func:`_pin_backend_config` — idempotent for entry points that pinned
    earlier)."""
    _pin_backend_config(device_str, num_cpu_devices)
    if device_str and device_str.startswith("cpu"):
        return "cpu"
    import jax

    platforms = {d.platform for d in jax.devices()}
    return "tpu" if ("tpu" in platforms or "axon" in platforms) else next(iter(platforms))


def _init_distributed(cfg: Cfg) -> None:
    """jax.distributed.initialize BEFORE any backend use (it refuses to run
    afterwards) — call at the very top of the train/test entry points.

    Triggered by ``parallel.multi_host: true`` (then a missing/unreachable
    coordinator is a hard error) OR by the standard cluster env vars being
    present (TPU pods set them; see parallel/distributed._CLUSTER_ENV_VARS).
    Bring-your-own clusters pass ``coordinator_address`` / ``num_processes``
    / ``process_id`` under ``parallel:``."""
    parallel = cfg.get("parallel") or {}
    multi_host = bool(parallel.get("multi_host"))
    from .parallel import distributed_initialize
    from .parallel.distributed import cluster_env_present

    if multi_host or cluster_env_present():
        distributed_initialize(
            parallel.get("coordinator_address"),
            parallel.get("num_processes"),
            parallel.get("process_id"),
            require=multi_host,
        )


def build_mesh(cfg: Cfg):
    parallel = cfg.get("parallel")
    if not parallel:
        return None
    from .parallel import distributed_initialize, make_mesh

    if parallel.get("multi_host"):
        # idempotent here (initialized at entry before backend use); kept for
        # direct build_mesh callers
        distributed_initialize(parallel.get("coordinator_address"))
    return make_mesh(
        parallel.get("num_devices"),
        parallel.get("model_parallel", 1),
        parallel.get("spatial_parallel", 1),
    )


def _build_losses(cfg: Cfg):
    loss_fns, loss_weights = [], []
    for c in cfg.losses:
        loss_fns.append(LOSSES.build(c))
        loss_weights.append(c.get("weight", 1.0))
    return loss_fns, loss_weights


def _build_metrics(cfg: Cfg):
    return [METRICS.build(c) for c in cfg.get("metrics", [])]


def train_from_config(cfg: Cfg):
    _import_components()
    from .runner.optim import build_lr_scheduler, build_optimizer

    saved_dir = Path(cfg.main.saved_dir)
    saved_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_yaml(saved_dir / "config.yaml")

    # ORDER MATTERS: (1) pure config pins (no backend state) so a CPU run
    # targets the right platform with enough virtual devices, (2) multi-host
    # init — jax.distributed.initialize refuses once the backend exists and
    # itself brings the backend up, (3) resolve the device name.
    device_str = (cfg.trainer.get("kwargs") or {}).get("device")
    _pin_backend_config(device_str, (cfg.get("parallel") or {}).get("num_devices"))
    _init_distributed(cfg)
    device = resolve_device(device_str)

    num_epochs = (cfg.trainer.get("kwargs") or {}).get("num_epochs", 1)
    seed_state = seed_everything(cfg.main.get("random_seed", "vsr"), num_epochs)

    logger.info("Create the training and validation datasets.")
    data_dir = Path(cfg.dataset.kwargs.data_dir)
    train_ds = DATASETS.build(cfg.dataset, data_dir=data_dir, type="train")
    valid_ds = DATASETS.build(cfg.dataset, data_dir=data_dir, type="valid")

    logger.info("Create the training and validation dataloaders.")
    dl_kwargs = dict(cfg.dataloader.get("kwargs") or {})
    train_bs = dl_kwargs.pop("train_batch_size", dl_kwargs.pop("batch_size", 1))
    valid_bs = dl_kwargs.pop("valid_batch_size", 1)
    dl_cls = DATALOADERS.get(cfg.dataloader.name)
    collate_fn = getattr(type(train_ds), "collate_fn", None)
    train_loader = dl_cls(train_ds, batch_size=train_bs, collate_fn=collate_fn, **dl_kwargs)
    # Deliberate deviation from the reference, which reuses the train kwargs
    # (shuffle included) for validation: validation is deterministic here.
    # Order only changes metrics when drop_last is set — the reference then
    # evaluates a DIFFERENT random subset each epoch, while a fixed set keeps
    # the monitor's best-checkpoint comparisons meaningful.
    dl_kwargs["shuffle"] = False
    valid_loader = dl_cls(valid_ds, batch_size=valid_bs, collate_fn=collate_fn, **dl_kwargs)

    logger.info("Create the network architecture.")
    from .config import NETS

    net = NETS.build(cfg.net)

    logger.info("Create the loss and metric functions.")
    loss_fns, loss_weights = _build_losses(cfg)
    metric_fns = _build_metrics(cfg)

    logger.info("Create the optimizer and the lr scheduler.")
    optimizer = build_optimizer(cfg.optimizer)
    lr_scheduler = build_lr_scheduler(cfg.get("lr_scheduler"), optimizer.base_lr)

    logger.info("Create the logger and the monitor.")
    logger_kwargs = dict(cfg.logger.get("kwargs") or {})
    logger_kwargs.pop("dummy_input", None)
    tb_logger = LOGGERS.get(cfg.logger.name)(log_dir=saved_dir / "log", net=net, **logger_kwargs)
    monitor = MONITORS.build(cfg.monitor, checkpoints_dir=saved_dir / "checkpoints")

    logger.info("Create the trainer.")
    trainer_kwargs = dict(cfg.trainer.get("kwargs") or {})
    trainer_kwargs["device"] = device
    if "checkpoint_backend" not in trainer_kwargs:
        import jax

        if jax.process_count() > 1:
            # multihost default: async orbax — every process participates in
            # the (coordinated) array save without stalling the train loop on
            # disk; the pickle backend is single-process-only
            trainer_kwargs["checkpoint_backend"] = "orbax_async"
    trainer = TRAINERS.get(cfg.trainer.name)(
        train_dataloader=train_loader,
        valid_dataloader=valid_loader,
        net=net,
        loss_fns=loss_fns,
        loss_weights=loss_weights,
        metric_fns=metric_fns,
        optimizer=optimizer,
        lr_scheduler=lr_scheduler,
        logger=tb_logger,
        monitor=monitor,
        mesh=build_mesh(cfg),
        seed_state=seed_state,
        **trainer_kwargs,
    )

    loaded_path = cfg.main.get("loaded_path")
    if loaded_path == "auto":
        # failure recovery: resume from the newest checkpoint if any exists
        from .runner.checkpoint import find_latest_checkpoint

        loaded_path = find_latest_checkpoint(saved_dir / "checkpoints")
        logger.info(f"Auto-resume: {'found ' + str(loaded_path) if loaded_path else 'no checkpoint, fresh start'}.")
    if loaded_path:
        logger.info(f'Load the previous checkpoint from "{loaded_path}".')
        trainer.load(Path(loaded_path))
        logger.info("Resume training.")
    else:
        logger.info("Start training.")
    trainer.train()
    logger.info("End training.")
    return trainer


def test_from_config(cfg: Cfg):
    _import_components()

    saved_dir = Path(cfg.main.saved_dir)
    saved_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_yaml(saved_dir / "config.yaml")

    # config pins → distributed init → device resolve (see train_from_config)
    device_str = (cfg.predictor.get("kwargs") or {}).get("device")
    _pin_backend_config(device_str, (cfg.get("parallel") or {}).get("num_devices"))
    _init_distributed(cfg)
    device = resolve_device(device_str)

    logger.info("Create the testing dataset and dataloader.")
    data_dir = Path(cfg.dataset.kwargs.data_dir)
    test_ds = DATASETS.build(cfg.dataset, data_dir=data_dir, type="test")
    dl_kwargs = dict(cfg.dataloader.get("kwargs") or {})
    dl_cls = DATALOADERS.get(cfg.dataloader.name)
    collate_fn = getattr(type(test_ds), "collate_fn", None)
    test_loader = dl_cls(test_ds, collate_fn=collate_fn, **dl_kwargs)

    logger.info("Create the network architecture.")
    from .config import NETS

    net = NETS.build(cfg.net)

    loss_fns, loss_weights = _build_losses(cfg)
    metric_fns = _build_metrics(cfg)

    logger.info("Create the predictor.")
    pred_kwargs = dict(cfg.predictor.get("kwargs") or {})
    pred_kwargs["device"] = device
    # parallel: {pad_h: true} — edge-extend indivisible heights so spatial
    # sharding engages (see BasePredictor.pad_h)
    if (cfg.get("parallel") or {}).get("pad_h"):
        pred_kwargs.setdefault("pad_h", True)
    predictor = PREDICTORS.get(cfg.predictor.name)(
        test_dataloader=test_loader,
        net=net,
        loss_fns=loss_fns,
        loss_weights=loss_weights,
        metric_fns=metric_fns,
        mesh=build_mesh(cfg),
        **pred_kwargs,
    )

    if cfg.net.name != "Bicubic":
        logger.info(f'Load the previous checkpoint from "{cfg.main.loaded_path}".')
        predictor.load(Path(cfg.main.loaded_path))
    else:
        first = test_ds[0]
        batch = {k: (v[None] if hasattr(v, "ndim") else [v]) for k, v in first.items()}
        predictor.init_params_like(batch)
    logger.info("Start testing.")
    predictor.predict()
    logger.info("End testing.")
    return predictor


def _raise_nofile_limit(target: int = 2048):
    """Raise RLIMIT_NOFILE like the reference entry point (``src/main.py:12-14``)
    — many NIfTI files can be open across loader threads."""
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
        if soft < target:
            resource.setrlimit(resource.RLIMIT_NOFILE, (min(target, hard), hard))
    except Exception:  # non-POSIX or restricted environments
        pass


def main(config_path, test: bool = False):
    _raise_nofile_limit()
    cfg = load_config(config_path)
    return test_from_config(cfg) if test else train_from_config(cfg)


def _parse_args():
    parser = argparse.ArgumentParser(description="The script for the training and the testing.")
    parser.add_argument("config_path", type=Path, help="The path of the config file.")
    parser.add_argument("--test", action="store_true", help="Run the test path.")
    return parser.parse_args()


def cli():
    """Console entry point (``evsr CONFIG [--test]`` — pyproject.toml)."""
    logging.basicConfig(
        format="%(asctime)s | %(levelname)s | %(message)s",
        level=logging.INFO,
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    args = _parse_args()
    main(args.config_path, args.test)


if __name__ == "__main__":
    cli()
