"""Model zoo registry.

Workload taxonomy mirrors the reference (``src/model/nets/__init__.py``):
SISR (Bicubic, EDSRNet, SRFBNet, DRFSISRNet), MISR (DUFNet, EDVRNet, RBPNet,
TOFlowNet), VSR (DRFNet, FRVSRNet, RefineNet).
"""
from ..config import NETS
from .bicubic import Bicubic
from .common import param_count, param_summary
from .duf_net import DUFNet
from .edvr_net import EDVRNet
from .edsr_net import EDSRNet
from .frvsr_net import FRVSRNet
from .rbp_net import RBPNet
from .refine_net import RefineNet
from .srfb_net import DRFNet, DRFSISRNet, SRFBNet
from .toflow_net import TOFlowNet

for _net in [
    Bicubic,
    EDVRNet,
    EDSRNet,
    SRFBNet,
    DRFSISRNet,
    DUFNet,
    RBPNet,
    TOFlowNet,
    DRFNet,
    FRVSRNet,
    RefineNet,
]:
    NETS.add(_net.__name__, _net)

__all__ = [
    "Bicubic",
    "EDVRNet",
    "EDSRNet",
    "SRFBNet",
    "DRFSISRNet",
    "DUFNet",
    "RBPNet",
    "TOFlowNet",
    "DRFNet",
    "FRVSRNet",
    "RefineNet",
    "param_count",
    "param_summary",
]
