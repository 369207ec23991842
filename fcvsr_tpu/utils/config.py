"""Config system: one dataclass covering both reference config axes.

Replaces the reference's two config mechanisms (SURVEY.md §5 — argparse
scripts in CVSR_train, 22 mmcv python config files in mmedit_train) with a
single dataclass enumerating the same axes: {model} x {dataset} x {QP}.
Named presets reproduce every shipped FCVSR config
(configs/restorers/fcvsr/fcvsr[_s]_{cvcp,reds,vimeo}LD_QP{22,27,32,37}.py).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

__all__ = ["ExperimentConfig", "preset", "PRESET_NAMES"]


@dataclass
class ModelConfig:
    name: str = "fcvsr"  # fcvsr | fcvsr_s | ftvsr | ttvsr | realbasicvsr
    #                      | glean | dic
    n_feats: int = 64
    in_channels: int = 3          # 1 = Y (CVCP), 3 = RGB (REDS/Vimeo)
    num_frames: int = 7
    num_blocks: int = 0           # recurrent trunk depth (0 = model default)
    in_size: int = 0              # GLEAN fixed LR size (0 = model default)
    out_size: int = 0             # GLEAN StyleGAN2 output size
    num_steps: int = 0            # DIC feedback steps (0 = model default)
    hg_num_keypoints: int = 68    # DIC landmark heatmap count


@dataclass
class DataConfig:
    dataset: str = "reds"         # cvcp | reds | vimeo | vid4 | folder
    qp: int = 37
    lr_root: str = ""
    gt_root: str = ""
    ann_file: str = ""
    meta_file: str = ""
    lr_patch: int = 128           # LR crop (mmedit: gt_patch 512 -> lq 128)
    batch_size: int = 2
    window_padding: str = "replicate"
    # RealBasicVSR: synthesize LQ from GT with the second-order degradation
    # chain (real_basicvsr restorer training; lr_root then optional)
    degradations: bool = False


@dataclass
class TrainConfig:
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.9, 0.99)
    schedule: str = "cosine_restart"   # cosine_restart | multistep | linear
    total_iters: int = 600000
    milestones: Sequence[int] = field(default_factory=lambda: [2000, 6000, 10000, 120000])
    gamma: float = 0.25
    min_lr: float = 1e-7
    loss: str = "charbonnier_mean"     # charbonnier_mean | charbonnier_sum
    ckpt_interval: int = 5000
    eval_interval: int = 5000
    log_interval: int = 100
    seed: int = 0
    use_ema: bool = False
    resume_from: str = ""
    load_from: str = ""


@dataclass
class GANConfig:
    """Two-optimizer adversarial training recipe (mmedit restorers/srgan.py:
    100-180, real_basicvsr.py:76-200, glean.py:1-83 semantics)."""

    enabled: bool = False
    disc: str = "unet_sn"         # unet_sn | stylegan2 | lightcnn | none
    gan_type: str = "vanilla"
    gan_loss_weight: float = 5e-2
    pixel_loss_weight: float = 1.0
    cleaning_loss_weight: float = 0.0   # RealBasicVSR cleaning branch
    disc_lr: float = 1e-4
    disc_steps: int = 1
    disc_init_steps: int = 0
    relativistic: bool = False


@dataclass
class EvalConfig:
    crop_border: int = 0
    convert_to: Optional[str] = "Y"
    metrics: Sequence[str] = field(default_factory=lambda: ["PSNR", "SSIM"])
    save_images: bool = False


@dataclass
class ExperimentConfig:
    name: str = "fcvsr_redsLD_QP37"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    gan: GANConfig = field(default_factory=GANConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    work_dir: str = "./work_dirs"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "ExperimentConfig":
        raw = json.loads(text)
        return cls(
            name=raw.get("name", "custom"),
            model=ModelConfig(**raw.get("model", {})),
            data=DataConfig(**raw.get("data", {})),
            train=TrainConfig(**{k: (tuple(v) if k == "betas" else v)
                                 for k, v in raw.get("train", {}).items()}),
            gan=GANConfig(**raw.get("gan", {})),
            eval=EvalConfig(**raw.get("eval", {})),
            work_dir=raw.get("work_dir", "./work_dirs"),
        )


_QPS = (22, 27, 32, 37)
_MODELS = ("fcvsr", "fcvsr_s")
_DATASETS = ("cvcp", "reds", "vimeo")


_FTVSR_PRESETS = (
    # the 7 reference FTVSR configs (configs/restorers/ftvsr/)
    "ftvsr_cvcp", "ftvsr_cvcpLD_QP22", "ftvsr_cvcpLD_QP27",
    "ftvsr_cvcpLD_QP32", "ftvsr_cvcpLD_QP37", "ftvsr_reds4",
    "ftvsr_vimeo90k",
)


def _ftvsr_preset(name: str) -> ExperimentConfig:
    """FTVSR recipes (FTVSR_cvcp.py etc.): TTVSR restorer + FTVSR generator,
    Charbonnier-mean, Adam 2e-4, fix_iter 2000 (SpyNet freeze)."""
    cfg = ExperimentConfig(name=name)
    cfg.model.name = "ftvsr"
    cfg.model.in_channels = 3
    # recurrent training segment length (the reference trains on long
    # REDS segments; 7 keeps CLI training tractable — raise via --config)
    cfg.model.num_frames = 7
    if "cvcp" in name:
        cfg.data.dataset = "cvcp"
        if "QP" in name:
            cfg.data.qp = int(name.rsplit("QP", 1)[1])
    elif "reds" in name:
        cfg.data.dataset = "reds"
    else:
        cfg.data.dataset = "vimeo"
    cfg.train.lr = 2e-4
    cfg.train.schedule = "cosine_restart"
    cfg.train.loss = "charbonnier_mean"
    cfg.data.batch_size = 1
    cfg.data.lr_patch = 64  # gt_patch 256
    return cfg


_GAN_PRESETS = (
    "realbasicvsr_reds", "realbasicvsr_wogan_reds",
    "glean_cat_8x", "dic_celeba", "dic_gan_celeba",
)


def _gan_preset(name: str) -> ExperimentConfig:
    """GAN / feedback family recipes.  The reference ships no configs for
    these restorers (only the model/restorer code, e.g. mmedit
    restorers/real_basicvsr.py:1-190, glean.py:1-83, dic.py:1-264); the
    hyper-parameters here follow those restorers' published recipes.
    Perceptual (VGG19) losses need pretrained torchvision weights that are
    not shippable offline — load them via GANRestorer.perceptual if present.
    """
    cfg = ExperimentConfig(name=name)
    cfg.train.schedule = "cosine_restart"
    cfg.train.loss = "charbonnier_mean"  # pixel criterion inside GAN path: L1
    if name.startswith("realbasicvsr"):
        cfg.model.name = "realbasicvsr"
        cfg.model.num_frames = 7   # reference trains 15/30-frame segments
        cfg.data.batch_size = 2
        cfg.data.lr_patch = 64
        cfg.data.degradations = True
        cfg.train.lr = 5e-5
        cfg.gan.enabled = True
        cfg.gan.cleaning_loss_weight = 1.0
        if "wogan" in name:       # pixel+cleaning pre-training stage
            cfg.gan.disc = "none"
            cfg.train.lr = 1e-4
        else:
            cfg.gan.disc = "unet_sn"
            cfg.gan.gan_loss_weight = 5e-2
    elif name.startswith("glean"):
        cfg.model.name = "glean"
        cfg.model.in_size = 32
        cfg.model.out_size = 256
        cfg.data.batch_size = 2
        cfg.data.lr_patch = 32
        cfg.train.lr = 1e-4
        cfg.gan.enabled = True
        cfg.gan.disc = "stylegan2"
        cfg.gan.gan_loss_weight = 1e-2
        cfg.gan.disc_lr = 1e-4
    else:  # dic
        cfg.model.name = "dic"
        cfg.model.num_steps = 4
        cfg.data.batch_size = 2
        cfg.data.lr_patch = 16     # 8x feedback SR -> 128px faces
        cfg.train.lr = 1e-4
        cfg.gan.enabled = True
        cfg.gan.pixel_loss_weight = 1.0
        if "gan" in name:
            cfg.gan.disc = "lightcnn"
            cfg.gan.gan_loss_weight = 5e-3
        else:
            cfg.gan.disc = "none"
    return cfg


def preset(name: str) -> ExperimentConfig:
    """Named presets: fcvsr[_s]_{cvcp,reds,vimeo}LD_QP{22,27,32,37} plus the
    7 FTVSR configs (ftvsr_cvcp[LD_QP*], ftvsr_reds4, ftvsr_vimeo90k) and
    the GAN/feedback family (realbasicvsr_*, glean_*, dic_*)."""
    if name in _FTVSR_PRESETS:
        return _ftvsr_preset(name)
    if name in _GAN_PRESETS:
        return _gan_preset(name)
    for model in _MODELS:
        for ds in _DATASETS:
            for qp in _QPS:
                if name == f"{model}_{ds}LD_QP{qp}":
                    cfg = ExperimentConfig(name=name)
                    cfg.model.name = model
                    cfg.data.dataset = ds
                    cfg.data.qp = qp
                    if ds == "cvcp":
                        # CVSR_train recipe (train_LD_freqCVSR_22.py:33-45)
                        cfg.model.in_channels = 1
                        cfg.train.lr = 0.5e-5 if model == "fcvsr" else 1e-4
                        cfg.train.schedule = "multistep"
                        cfg.train.loss = "charbonnier_sum"
                        cfg.data.batch_size = 6 if model == "fcvsr" else 4
                        cfg.data.lr_patch = 128
                    else:
                        # mmedit recipe (fcvsr_redsLD_QP37.py:92-105)
                        cfg.model.in_channels = 3
                        cfg.train.lr = 2e-4
                        cfg.train.schedule = "cosine_restart"
                        cfg.train.loss = "charbonnier_mean"
                        cfg.data.batch_size = 2
                        cfg.data.lr_patch = 128 if model == "fcvsr" else 64
                    return cfg
    raise KeyError(f"unknown preset {name}; options: {PRESET_NAMES[:4]}...")


PRESET_NAMES = ([f"{m}_{d}LD_QP{q}" for m in _MODELS for d in _DATASETS
                 for q in _QPS] + list(_FTVSR_PRESETS) + list(_GAN_PRESETS))
