"""Component registries (mmedit models/registry.py + builder.py equivalents).

One generic string->builder registry powering MODELS / BACKBONES / LOSSES /
DATASETS, with ``build(cfg)`` consuming mmedit-style ``dict(type=..., **kw)``
configs so reference config files translate mechanically.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

__all__ = ["Registry", "BACKBONES", "LOSSES", "build"]


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._entries: Dict[str, Callable] = {}

    def register(self, name: str = None):
        def deco(fn):
            self._entries[name or fn.__name__] = fn
            return fn

        return deco

    def register_obj(self, name: str, obj):
        self._entries[name] = obj
        return obj

    def get(self, name: str):
        if name not in self._entries:
            raise KeyError(
                f"{self.name} registry has no '{name}'; "
                f"known: {sorted(self._entries)}")
        return self._entries[name]

    def __contains__(self, name):
        return name in self._entries

    def keys(self):
        return sorted(self._entries)


BACKBONES = Registry("backbones")
LOSSES = Registry("losses")


def build(registry: Registry, cfg: dict) -> Any:
    """mmedit-style: build(BACKBONES, dict(type='FCVSRNet', n_feats=64))."""
    cfg = dict(cfg)
    typ = cfg.pop("type")
    return registry.get(typ)(**cfg)


def _register_defaults():
    from . import (
        BasicVSRNet,
        BasicVSRPlusPlus,
        EDVRNet,
        FCVSRNet,
        IconVSR,
        SpyNet,
        TDANNet,
    )
    from .ftvsr import FTVSRNet, TTVSRNet
    from .sisr import EDSR, MSRResNet, RDN, RRDBNet, SRCNN, TOFlow
    from .fcvsr_tfdc import FCVSRTFDCNet
    from .raft import RAFT
    from .sidecvsr import SIDECVSR
    from ..train import losses as L

    for cls in (BasicVSRNet, BasicVSRPlusPlus, EDVRNet, FCVSRNet, IconVSR,
                TDANNet, SpyNet, FTVSRNet):
        BACKBONES.register_obj(cls.__name__, cls)
    BACKBONES.register_obj("TTVSRNet", TTVSRNet)
    for cls in (EDSR, MSRResNet, RDN, RRDBNet, SRCNN, TOFlow,
                FCVSRTFDCNet, RAFT, SIDECVSR):
        BACKBONES.register_obj(cls.__name__, cls)
    BACKBONES.register_obj("FCVSR_SNet", FCVSRNet.small)
    BACKBONES.register_obj("GShiftNet", lambda **kw: FCVSRNet(in_channels=1, **kw))
    BACKBONES.register_obj(
        "GShiftNet_S", lambda **kw: FCVSRNet.small(in_channels=1, **kw))

    LOSSES.register_obj("CharbonnierLoss", L.charbonnier)
    LOSSES.register_obj("CharbonnierLossSum", L.charbonnier_sum)
    LOSSES.register_obj("L1Loss", L.l1_loss)
    LOSSES.register_obj("MSELoss", L.mse_loss)


_register_defaults()
