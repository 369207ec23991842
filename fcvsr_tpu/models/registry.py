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
    from .dic import DICNet, FeedbackHourglass
    from .liif import LIIFEDSR, LIIFRDN
    from .ttsr import TTSR, TTSRNet
    from .glean import GLEANStyleGANv2
    from .real_basicvsr import RealBasicVSRNet
    from .stylegan2 import StyleGAN2Discriminator, StyleGAN2Generator
    from .discriminators import (LightCNN, ModifiedVGG,
                                 UNetDiscriminatorWithSpectralNorm)
    from ..train import losses as L
    from ..train import gan_losses as GL

    for cls in (BasicVSRNet, BasicVSRPlusPlus, EDVRNet, FCVSRNet, IconVSR,
                TDANNet, SpyNet, FTVSRNet):
        BACKBONES.register_obj(cls.__name__, cls)
    BACKBONES.register_obj("TTVSRNet", TTVSRNet)
    for cls in (EDSR, MSRResNet, RDN, RRDBNet, SRCNN, TOFlow,
                FCVSRTFDCNet, RAFT, SIDECVSR,
                DICNet, FeedbackHourglass, LIIFEDSR, LIIFRDN, TTSR, TTSRNet,
                GLEANStyleGANv2, RealBasicVSRNet, StyleGAN2Generator,
                StyleGAN2Discriminator, ModifiedVGG, LightCNN,
                UNetDiscriminatorWithSpectralNorm):
        BACKBONES.register_obj(cls.__name__, cls)
    BACKBONES.register_obj("FCVSR_SNet", FCVSRNet.small)
    BACKBONES.register_obj("GShiftNet", lambda **kw: FCVSRNet(in_channels=1, **kw))
    BACKBONES.register_obj(
        "GShiftNet_S", lambda **kw: FCVSRNet.small(in_channels=1, **kw))

    LOSSES.register_obj("CharbonnierLoss", L.charbonnier)
    LOSSES.register_obj("CharbonnierLossSum", L.charbonnier_sum)
    LOSSES.register_obj("L1Loss", L.l1_loss)
    LOSSES.register_obj("MSELoss", L.mse_loss)
    LOSSES.register_obj("GANLoss", GL.gan_loss)
    LOSSES.register_obj("GradientLoss", GL.gradient_loss)
    LOSSES.register_obj("DiscShiftLoss", GL.disc_shift_loss)
    LOSSES.register_obj("GradientPenaltyLoss", GL.gradient_penalty_loss)
    LOSSES.register_obj("PerceptualLoss", GL.perceptual_loss)
    LOSSES.register_obj("TransferalPerceptualLoss",
                        GL.transferal_perceptual_loss)
    from .discriminators import light_cnn_feature_loss
    LOSSES.register_obj("LightCNNFeatureLoss", light_cnn_feature_loss)


_register_defaults()
