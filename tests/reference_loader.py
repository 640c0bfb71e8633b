"""Dynamically load modules from the read-only reference repo for parity tests.

The reference package ``__init__`` chain imports nibabel/SimpleITK (absent
here), so modules are loaded file-by-file with stub parent packages.  Tests
using this must skip gracefully when /root/reference is unavailable.
"""
from __future__ import annotations

import importlib.util
import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_ROOT / "src").is_dir()


def _ensure_pkg(name: str):
    if name not in sys.modules:
        mod = types.ModuleType(name)
        mod.__path__ = []
        sys.modules[name] = mod
    return sys.modules[name]


def load_reference_module(relpath: str, modname: str):
    """Load e.g. ``src/model/nets/refine_net.py`` as ``modname`` with stubbed
    parent packages (bypasses the reference's heavy ``__init__`` imports)."""
    parts = modname.split(".")
    for i in range(1, len(parts)):
        pkg = _ensure_pkg(".".join(parts[:i]))
        if i > 1:  # wire parent.child like a real import would
            setattr(sys.modules[".".join(parts[: i - 1])], parts[i - 1], pkg)
    spec = importlib.util.spec_from_file_location(modname, REFERENCE_ROOT / relpath)
    module = importlib.util.module_from_spec(spec)
    sys.modules[modname] = module
    if len(parts) > 1:
        setattr(sys.modules[".".join(parts[:-1])], parts[-1], module)
    spec.loader.exec_module(module)
    return module


def load_reference_edvr():
    """Reference EDVR_arch with the CUDA ``dcn`` extension replaced by the
    torch oracle stub (tests/dcn_oracle.py) so the full net runs on CPU."""
    from dcn_oracle import install_dcn_stub

    install_dcn_stub()
    load_reference_module("src/model/nets/base_net.py", "src.model.nets.base_net")
    load_reference_module(
        "src/model/nets/edvr_net/arch_util.py", "src.model.nets.edvr_net.arch_util"
    )
    return load_reference_module(
        "src/model/nets/edvr_net/EDVR_arch.py", "src.model.nets.edvr_net.EDVR_arch"
    )


def load_reference_refine_net():
    """Reference RefineNet patched to run on CPU (its ``init_hidden``
    hardcodes ``.cuda()`` — SURVEY.md §5 quirk 2)."""
    import torch

    load_reference_module("src/model/nets/base_net.py", "src.model.nets.base_net")
    rn = load_reference_module("src/model/nets/refine_net.py", "src.model.nets.refine_net")

    def init_hidden(self, batch_size, height, width):
        return (
            torch.zeros(batch_size, self.hidden_dim, height, width),
            torch.zeros(batch_size, self.hidden_dim, height, width),
        )

    rn.ConvLSTMCell.init_hidden = init_hidden
    return rn
