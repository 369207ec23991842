from .corr import corr_lookup
from .freq import gaussian_band_masks, irfft_features, rfft_features, split_freq
from .resize import (
    downsample2x_bilinear,
    resize_bicubic,
    resize_bilinear,
    upsample2x_bilinear,
)
from .sac import iac, sac
from .warp import flow_warp, grid_sample_bilinear

__all__ = [
    "corr_lookup",
    "gaussian_band_masks",
    "irfft_features",
    "rfft_features",
    "split_freq",
    "resize_bicubic",
    "resize_bilinear",
    "upsample2x_bilinear",
    "downsample2x_bilinear",
    "iac",
    "sac",
    "flow_warp",
    "grid_sample_bilinear",
]
