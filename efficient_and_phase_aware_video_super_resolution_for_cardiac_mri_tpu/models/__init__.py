"""Model zoo registry.

Workload taxonomy mirrors the reference (``src/model/nets/__init__.py``):
SISR (Bicubic, EDSRNet, SRFBNet, DRFSISRNet), MISR (DUFNet, EDVRNet, RBPNet,
TOFlowNet), VSR (DRFNet, FRVSRNet, RefineNet).
"""
from ..config import NETS
from .bicubic import Bicubic
from .common import param_count, param_summary
from .refine_net import RefineNet

NETS.add("RefineNet", RefineNet)
NETS.add("Bicubic", Bicubic)

__all__ = ["RefineNet", "Bicubic", "param_count", "param_summary"]
