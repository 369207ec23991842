from .basicvsr import BasicVSRNet
from .basicvsr_pp import BasicVSRPlusPlus
from .edvr import EDVRNet
from .fcvsr import FCVSRNet, MFFR, MGAA, fcvsr_etc_forward
from .iconvsr import IconVSR, TDANNet
from .spynet import SpyNet, spynet_flow

__all__ = [
    "FCVSRNet", "MFFR", "MGAA", "fcvsr_etc_forward",
    "BasicVSRNet", "BasicVSRPlusPlus", "EDVRNet", "IconVSR", "TDANNet",
    "SpyNet", "spynet_flow",
]
