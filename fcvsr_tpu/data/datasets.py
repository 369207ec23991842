"""Clip datasets: folder-PNG sequences, annotation-file driven eval sets,
RAM-cached CVCP-style training clips.

Rebuilds the reference data layer (SURVEY.md §2.5) host-side:

* ``ClipFolderDataset``   — generic {seq_dir}/{frame}.png LR/GT pairs, the
  shape behind mmedit ``SRREDSMultipleGTDataset`` / ``SRTestMultipleGTDataset``
  / ``SRFolderDataset``.
* ``AnnotationDataset``   — mmedit ``SRVid4Dataset`` (ann file lines
  "calendar 41 (720,576,3)"), per-clip metric averaging is done by the eval
  driver.
* ``CVCPClipCache``       — CVSR_train ``CDVL_Dataset`` (data_LD_LR.py:10):
  whole-dataset uint8 RAM cache, random 7-frame training windows with
  centre-frame GT.
* ``Vimeo90KDataset``     — septuplet lists (meta_info_Vimeo90K_*.txt).

All outputs are numpy; ``as_model_input`` converts a (T, H, W, C) uint8 stack
to the model's (1, T, C, H, W) float layout.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from .pipelines import (
    padded_window_indices,
    paired_flip_rotate,
    paired_random_crop,
    segment_indices,
    to_float,
)

__all__ = [
    "load_image",
    "as_model_input",
    "ClipFolderDataset",
    "AnnotationDataset",
    "CVCPClipCache",
    "Vimeo90KDataset",
]


def load_image(path: str, grayscale: bool = False) -> np.ndarray:
    """PNG/JPG -> uint8 (H, W, C) array (C=1 for grayscale)."""
    from PIL import Image

    img = Image.open(path)
    if grayscale:
        img = img.convert("L")
        arr = np.asarray(img, np.uint8)[..., None]
    else:
        img = img.convert("RGB")
        arr = np.asarray(img, np.uint8)
    return arr


def as_model_input(frames_u8: np.ndarray) -> np.ndarray:
    """(T, H, W, C) uint8 -> (1, T, C, H, W) float32 in [0,1]."""
    x = to_float(frames_u8)
    return np.transpose(x, (0, 3, 1, 2))[None]


def _list_frames(seq_dir: str) -> List[str]:
    exts = (".png", ".jpg", ".jpeg", ".bmp")
    names = sorted(n for n in os.listdir(seq_dir) if n.lower().endswith(exts))
    return [os.path.join(seq_dir, n) for n in names]


@dataclass
class ClipFolderDataset:
    """Paired LR/GT folder dataset: lr_root/{seq}/{frame}.png and same in
    gt_root.  Iterate test windows or sample training windows."""

    lr_root: str
    gt_root: Optional[str] = None
    window: int = 7
    scale: int = 4
    grayscale: bool = False
    padding: str = "replicate"
    sequences: Optional[Sequence[str]] = None

    def __post_init__(self):
        if self.sequences is None:
            self.sequences = sorted(
                d for d in os.listdir(self.lr_root)
                if os.path.isdir(os.path.join(self.lr_root, d))
            )

    def seq_frames(self, seq: str) -> Tuple[List[str], Optional[List[str]]]:
        lr = _list_frames(os.path.join(self.lr_root, seq))
        gt = (_list_frames(os.path.join(self.gt_root, seq))
              if self.gt_root else None)
        return lr, gt

    def iter_test_windows(self, seq: str) -> Iterator[tuple]:
        """Yield (center_idx, lr_window_u8 (T,H,W,C), gt_u8 or None)."""
        lr_paths, gt_paths = self.seq_frames(seq)
        frames = [load_image(p, self.grayscale) for p in lr_paths]
        for i in range(len(frames)):
            idx = padded_window_indices(i, len(frames), self.window, self.padding)
            window = np.stack([frames[j] for j in idx])
            gt = load_image(gt_paths[i], self.grayscale) if gt_paths else None
            yield i, window, gt

    def sample_train_window(self, rng: np.random.Generator, lr_patch: int = 64):
        """Random sequence + window + aligned crop + aug.

        Returns (lr (T,p,p,C) f32, gt_center (P,P,C) f32)."""
        seq = self.sequences[int(rng.integers(len(self.sequences)))]
        lr_paths, gt_paths = self.seq_frames(seq)
        assert gt_paths, "training needs gt_root"
        n = len(lr_paths)
        idx = segment_indices(rng, n, self.window)
        lr = np.stack([load_image(lr_paths[j], self.grayscale) for j in idx])
        center = idx[self.window // 2]
        gt = load_image(gt_paths[center], self.grayscale)[None]
        lr, gt = paired_random_crop(rng, lr, gt, lr_patch, self.scale)
        lr, gt = paired_flip_rotate(rng, lr, gt)
        return to_float(lr), to_float(gt[0])

    def sample_train_sequence(self, rng: np.random.Generator,
                              lr_patch: int = 64):
        """Random window with per-frame GT (recurrent models: FTVSR/TTVSR/
        BasicVSR-family training, mmedit SRREDSMultipleGTDataset semantics).

        Returns (lr (T,p,p,C) f32, gt (T,P,P,C) f32)."""
        seq = self.sequences[int(rng.integers(len(self.sequences)))]
        lr_paths, gt_paths = self.seq_frames(seq)
        assert gt_paths, "training needs gt_root"
        idx = segment_indices(rng, len(lr_paths), self.window)
        lr = np.stack([load_image(lr_paths[j], self.grayscale) for j in idx])
        gt = np.stack([load_image(gt_paths[j], self.grayscale) for j in idx])
        lr, gt = paired_random_crop(rng, lr, gt, lr_patch, self.scale)
        lr, gt = paired_flip_rotate(rng, lr, gt)
        return to_float(lr), to_float(gt)


_ANN_RE = re.compile(r"^(\S+)\s+(\d+)\s+\((\d+),(\d+),(\d+)\)")


@dataclass
class AnnotationDataset:
    """Ann-file dataset (Vid4/REDS4 style: 'name frames (h,w,c)')."""

    lr_root: str
    gt_root: str
    ann_file: str
    window: int = 7
    scale: int = 4
    padding: str = "replicate"

    def clips(self) -> List[Tuple[str, int, Tuple[int, int, int]]]:
        out = []
        with open(self.ann_file) as f:
            for line in f:
                m = _ANN_RE.match(line.strip())
                if m:
                    name, n, h, w, c = m.group(1), *map(int, m.group(2, 3, 4, 5))
                    out.append((name, n, (h, w, c)))
        return out

    def as_folder(self) -> ClipFolderDataset:
        return ClipFolderDataset(
            lr_root=self.lr_root, gt_root=self.gt_root, window=self.window,
            scale=self.scale, padding=self.padding,
            sequences=[c[0] for c in self.clips()],
        )


class CVCPClipCache:
    """CVSR_train CDVL-style RAM cache: preload all LR (and HR) frames as
    uint8 once, then sample random 7-frame windows with centre-frame GT
    (data_LD_LR.py:43-75, 129-246)."""

    def __init__(self, lr_root: str, hr_root: str, sequences: Sequence[str],
                 window: int = 7, grayscale: bool = True):
        self.window = window
        self.lr_clips = []
        self.hr_clips = []
        for seq in sequences:
            lr = np.stack([load_image(p, grayscale)
                           for p in _list_frames(os.path.join(lr_root, seq))])
            hr = np.stack([load_image(p, grayscale)
                           for p in _list_frames(os.path.join(hr_root, seq))])
            self.lr_clips.append(lr)
            self.hr_clips.append(hr)

    def sample(self, rng: np.random.Generator, lr_patch: int = 128,
               scale: int = 4):
        ci = int(rng.integers(len(self.lr_clips)))
        lr_clip, hr_clip = self.lr_clips[ci], self.hr_clips[ci]
        idx = segment_indices(rng, len(lr_clip), self.window)
        lr = lr_clip[idx]
        gt = hr_clip[idx[self.window // 2]][None]
        lr, gt = paired_random_crop(rng, lr, gt, lr_patch, scale)
        lr, gt = paired_flip_rotate(rng, lr, gt)
        return to_float(lr), to_float(gt[0])


@dataclass
class Vimeo90KDataset:
    """Vimeo-90K septuplets via meta-info list ('00001/0001' per line)."""

    lr_root: str
    gt_root: str
    meta_file: str
    scale: int = 4

    def __post_init__(self):
        with open(self.meta_file) as f:
            self.keys = [ln.split()[0] for ln in f if ln.strip()]

    def load(self, key: str):
        lr_dir = os.path.join(self.lr_root, key)
        gt_dir = os.path.join(self.gt_root, key)
        lr = np.stack([load_image(p) for p in _list_frames(lr_dir)])
        gt = np.stack([load_image(p) for p in _list_frames(gt_dir)])
        return lr, gt

    def sample_train(self, rng: np.random.Generator, lr_patch: int = 64):
        key = self.keys[int(rng.integers(len(self.keys)))]
        lr, gt = self.load(key)
        center = lr.shape[0] // 2
        gtc = gt[center][None]
        lr, gtc = paired_random_crop(rng, lr, gtc, lr_patch, self.scale)
        lr, gtc = paired_flip_rotate(rng, lr, gtc)
        return to_float(lr), to_float(gtc[0])


class SideInfoClipCache:
    """HEVC coding-prior dataset (CVSR_train ``CDVL_sideInfo_Dataset``,
    opt/data_LD.py:10-246): per-sequence directories holding LR/HR PNGs plus
    side information — ``MV_l0/NNNNN_mvl0.npy``, ``MV_l1/NNNNN_mvl1.npy``,
    ``Residue/NNNNN_res.npy``, ``Partition_Map/NNNNN_M_mask.png``,
    ``pred_unfiltered/NNNNN_unflt.png``, ``Prediction_Signal/NNNNN_pred.png``.
    All frames are RAM-cached (uint8/int8) once, like the reference.

    ``sample`` returns a dict of model-ready arrays for ``SIDECVSR``:
    lrs (T,p,p,1), gt (4p,4p,1), mvs (T,p,p,2), residue/partition/unfiltered
    (T,p,p,1) — floats scaled like the reference ToTensor (/255; MVs raw).
    """

    def __init__(self, lr_root: str, hr_root: str, side_root: str,
                 sequences: Sequence[str], window: int = 7,
                 frames_per_seq: int = 32):
        import numpy as np

        self.window = window
        self.clips = []
        for seq in sequences:
            lr = np.stack([load_image(p, grayscale=True)
                           for p in _list_frames(os.path.join(lr_root, seq))])
            hr = np.stack([load_image(p, grayscale=True)
                           for p in _list_frames(os.path.join(hr_root, seq))])
            n = lr.shape[0]
            side_dir = os.path.join(side_root, seq)
            mv = np.stack([
                np.clip(np.load(os.path.join(side_dir, "MV_l0",
                                             f"{i:05d}_mvl0.npy")),
                        -128, 127).astype(np.int8)
                for i in range(n)])
            res = np.stack([
                np.clip(np.load(os.path.join(side_dir, "Residue",
                                             f"{i:05d}_res.npy")),
                        -128, 127).astype(np.int8)
                for i in range(n)])
            pm = np.stack([
                load_image(os.path.join(side_dir, "Partition_Map",
                                        f"{i:05d}_M_mask.png"), True)[..., 0]
                for i in range(n)])
            uf = np.stack([
                load_image(os.path.join(side_dir, "pred_unfiltered",
                                        f"{i:05d}_unflt.png"), True)[..., 0]
                for i in range(n)])
            self.clips.append(dict(lr=lr, hr=hr, mv=mv, res=res, pm=pm, uf=uf))

    def sample(self, rng: np.random.Generator, lr_patch: int = 64,
               scale: int = 4):
        ci = int(rng.integers(len(self.clips)))
        clip = self.clips[ci]
        n = clip["lr"].shape[0]
        idx = segment_indices(rng, n, self.window)
        h, w = clip["lr"].shape[1:3]
        top = int(rng.integers(0, h - lr_patch + 1))
        left = int(rng.integers(0, w - lr_patch + 1))
        sl = (idx, slice(top, top + lr_patch), slice(left, left + lr_patch))

        def crop(a):
            return a[idx][:, top : top + lr_patch, left : left + lr_patch]

        out = {
            "lrs": to_float(crop(clip["lr"])),
            "mvs": crop(clip["mv"]).astype(np.float32),
            "residue": (crop(clip["res"]).astype(np.float32)[..., None] + 128.0) / 255.0,
            "partition": to_float(crop(clip["pm"])[..., None]),
            "unfiltered": to_float(crop(clip["uf"])[..., None]),
        }
        center = idx[self.window // 2]
        gt = clip["hr"][center,
                        top * scale : (top + lr_patch) * scale,
                        left * scale : (left + lr_patch) * scale]
        out["gt"] = to_float(gt)
        return out


@dataclass
class MM522Dataset:
    """MMCNN MM520/522 training dataset (reference sr_mm522_dataset.py:25-128).

    Keys come from a slash-separated meta file whose lines look like
    ``root/sub1/sub2/clipA/clipB/frame``; the key is the trailing
    ``clipA/clipB/frame`` triple, and frames live at
    ``{lq,gt}_root/clipA/clipB/<frame>.png``.  ``val_partition``: 'official'
    drops clips 240-269 (REDS-style), 'eval' drops 'eval_000' — the
    reference's two choices.  Temporal interval augmentation + random
    reverse follow the reference __getitem__ (the rest of the reference
    class depends on the external ``basicsr`` package and is not part of
    its runnable surface).
    """

    lq_root: str
    gt_root: str
    meta_file: str
    num_input_frames: int = 7
    scale: int = 4
    val_partition: str = "official"
    interval_list: Tuple[int, ...] = (1,)
    random_reverse: bool = False

    def __post_init__(self):
        if self.val_partition == "eval":
            val = {"eval_000"}
        elif self.val_partition == "official":
            val = {f"{v:03d}" for v in range(240, 270)}
        else:
            raise ValueError(
                f"Wrong validation partition {self.val_partition}. "
                "Supported ones are ['official', 'eval'].")
        self.keys = []
        with open(self.meta_file) as f:
            for line in f:
                parts = line.strip().split("/")
                if len(parts) < 3:
                    continue
                key = "/".join(parts[-3:])
                if key.split("/")[0] not in val:
                    self.keys.append(key)

    def _frames(self, clip_dir: str) -> List[str]:
        return _list_frames(clip_dir)

    def sample_train_window(self, rng: np.random.Generator,
                            lr_patch: int = 64):
        """Centre-GT training window with interval augmentation + optional
        random temporal reverse.  Returns (lr (T,p,p,C), gt (P,P,C)) f32."""
        key = self.keys[int(rng.integers(len(self.keys)))]
        clip = os.path.dirname(key)
        lr_paths = self._frames(os.path.join(self.lq_root, clip))
        gt_paths = self._frames(os.path.join(self.gt_root, clip))
        interval = int(self.interval_list[
            int(rng.integers(len(self.interval_list)))])
        t = self.num_input_frames
        idx = segment_indices(rng, len(lr_paths), t, interval)
        if self.random_reverse and rng.uniform() < 0.5:
            idx = idx[::-1]
        lr = np.stack([load_image(lr_paths[j]) for j in idx])
        gt = load_image(gt_paths[idx[len(idx) // 2]])[None]
        lr, gt = paired_random_crop(rng, lr, gt, lr_patch, self.scale)
        lr, gt = paired_flip_rotate(rng, lr, gt)
        return to_float(lr), to_float(gt[0])
