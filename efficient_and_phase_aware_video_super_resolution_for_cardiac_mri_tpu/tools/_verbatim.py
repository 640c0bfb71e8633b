"""Shared helper for the verbatim-YAML runbooks.

``patch_paths_only`` substitutes ONLY the path-valued fields of a reference
config (data_dir / pos_code_path / coordinates_path / saved_dir /
loaded_path) — everything else stays the reference's bytes.  Used by
``verbatim_train_tpu`` and ``convergence_tpu``; mirrored by
``tests/test_reference_configs_run.py`` (which additionally asserts the
loaded_path expectation per YAML kind).
"""
from __future__ import annotations


def patch_paths_only(cfg, tree, out_dir, loaded_path=None):
    cfg.main.saved_dir = str(out_dir)
    cfg.dataset.kwargs.data_dir = str(
        tree["imgs_dir"] if "imgs" in cfg.dataset.kwargs.data_dir else tree["videos_dir"]
    )
    if "pos_code_path" in cfg.dataset.kwargs:
        cfg.dataset.kwargs.pos_code_path = str(tree["pos_code_path"])
    for metric in cfg.get("metrics", []):
        if "coordinates_path" in metric.get("kwargs", {}):
            metric.kwargs.coordinates_path = str(tree["coordinates_path"])
    # predictors carry their own saved_dir kwarg (the reference test schema)
    predictor = cfg.get("predictor")
    if predictor and "saved_dir" in predictor.get("kwargs", {}):
        cfg.predictor.kwargs.saved_dir = str(out_dir)
    if loaded_path is not None:
        cfg.main.loaded_path = str(loaded_path)
    return cfg
