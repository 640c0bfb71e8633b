"""Subprocess worker for the AOT executable-cache tests.

Run in a FRESH process with the persistent compilation cache stripped: the
AOT store path is process-state-dependent upstream — if ANY executable was
restored from jax's persistent compilation cache earlier in the process,
XLA:CPU's serializer can emit blobs referencing shared function-library
entries by name that a clean process lacks ("NOT_FOUND: Buffer Definition
Event: Function ... not found").  utils/aot.py's store-time validation then
(correctly) refuses to cache, which is the right PRODUCTION behavior but
would make an in-suite store test vacuous.  A clean subprocess is the honest
serving scenario: process starts, aot_cache configured from the beginning.

Usage: python _aot_worker.py {trainer|predictor} CACHE_DIR
Prints one JSON line: {"checksum": float, "entries": [names], "hits": int}.
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def _items(n=4, seed=7):
    rng = np.random.default_rng(seed)
    return [
        {
            "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(n)
    ]


class _ArrayDataset:
    def __init__(self, items):
        self.items = items
        self.data = [
            (Path(f"patient{i:03d}_2d_slice01_frame{i+1:0>2d}.nii.gz"), None)
            for i in range(len(items))
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i, rng=None):
        return self.items[i]


def main():
    mode, cache_dir = sys.argv[1], sys.argv[2]

    import logging

    hits = {"n": 0}

    class _HitCounter(logging.Handler):
        def emit(self, record):
            if "AOT cache hit" in record.getMessage():
                hits["n"] += 1

    aot_logger = logging.getLogger(
        "efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu"
        ".utils.aot"
    )
    aot_logger.setLevel(logging.INFO)  # cache hits log at INFO
    aot_logger.addHandler(_HitCounter())

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        losses as L,
        metrics as M,
        models as nets,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data import (
        Dataloader,
    )

    items = _items()
    if mode == "trainer":
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
            TRAINERS,
        )
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
            Optimizer,
        )
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
            runner as _r,  # noqa: F401 (registry)
        )

        ds = _ArrayDataset(items)
        net = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
        trainer = TRAINERS.get("AcdcSISRTrainer")(
            train_dataloader=Dataloader(ds, batch_size=2, shuffle=False),
            valid_dataloader=Dataloader(ds, batch_size=2, shuffle=False),
            net=net,
            loss_fns=[L.L1Loss()],
            metric_fns=[M.PSNR()],
            optimizer=Optimizer("Adam", lr=1e-3),
            num_epochs=2,
            aot_cache=cache_dir,
        )
        trainer.train()
        checksum = float(
            sum(float(np.abs(np.asarray(x)).sum()) for x in jax.tree.leaves(trainer.params))
        )
    elif mode == "predictor":
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
            SISRPredictor,
        )

        ds = _ArrayDataset(items)
        pred = SISRPredictor(
            device="cpu",
            test_dataloader=Dataloader(ds, batch_size=1, shuffle=False),
            net=nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4),
            loss_fns=[L.L1Loss()],
            metric_fns=[M.PSNR()],
            aot_cache=cache_dir,
        )
        first = items[0]
        batch = {
            k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
            for k, v in first.items()
        }
        pred.init_params_like(batch)
        log = pred.predict()
        checksum = float(log["PSNR"])
    else:
        raise SystemExit(f"unknown mode {mode}")

    entries = sorted(p.name for p in Path(cache_dir).glob("*.jaxexe"))
    print(json.dumps({"checksum": checksum, "entries": entries, "hits": hits["n"]}))


if __name__ == "__main__":
    main()
