from .datasets import (
    AnnotationDataset,
    ClipFolderDataset,
    CVCPClipCache,
    MM522Dataset,
    Vimeo90KDataset,
    as_model_input,
    load_image,
)
from .pipelines import (
    padded_window_indices,
    paired_flip_rotate,
    paired_random_crop,
    segment_indices,
    to_float,
)

__all__ = [
    "AnnotationDataset",
    "ClipFolderDataset",
    "CVCPClipCache",
    "MM522Dataset",
    "Vimeo90KDataset",
    "as_model_input",
    "load_image",
    "padded_window_indices",
    "paired_flip_rotate",
    "paired_random_crop",
    "segment_indices",
    "to_float",
]
