"""Image file I/O (SURVEY.md component #2, layer A): load / save / batch
loading for the file-driven encode paths (CLI, checkpointed batch driver —
BASELINE.json:11's 1024-image config runs from files through here).

Host-side PIL/NumPy only; device code never touches files. `probe` reads just
the header (no pixel decode), so the batch driver can group thousands of
files by shape without loading them.
"""
from __future__ import annotations

import glob as _glob
import os

import numpy as np

IMAGE_EXTS = (".png", ".ppm", ".pgm", ".bmp", ".jpg", ".jpeg", ".tif",
              ".tiff", ".webp")


def load(path: str) -> np.ndarray:
    """Load an image file -> uint8 [H,W] (grayscale) or [H,W,3] (RGB)."""
    from PIL import Image
    img = Image.open(path)
    if img.mode not in ("L", "RGB"):
        img = img.convert("RGB")
    return np.asarray(img)


def save(path: str, arr: np.ndarray) -> None:
    """Save a uint8 array as an image file (format from the extension)."""
    from PIL import Image
    Image.fromarray(arr).save(path)


def probe(path: str) -> tuple[int, int, int]:
    """(height, width, channels) from the file header — no pixel decode."""
    from PIL import Image
    with Image.open(path) as img:
        w, h = img.size
        ch = 1 if img.mode == "L" else 3
    return h, w, ch


def find_images(root: str, pattern: str = "*") -> list[str]:
    """Sorted image files under a directory (or matching a glob pattern)."""
    if os.path.isdir(root):
        paths = _glob.glob(os.path.join(root, pattern))
    else:
        paths = _glob.glob(root)
    return sorted(p for p in paths
                  if os.path.splitext(p)[1].lower() in IMAGE_EXTS
                  and os.path.isfile(p))


def load_batch(paths: list[str]) -> np.ndarray:
    """Load same-shape images into one [B,H,W(,3)] uint8 batch.

    Raises ValueError on a shape mismatch — callers with heterogeneous
    inputs should group by `probe` first (batch.run_batch does).
    """
    if not paths:
        raise ValueError("load_batch: empty path list")
    arrs = [load(p) for p in paths]
    shape = arrs[0].shape
    for p, a in zip(paths, arrs):
        if a.shape != shape:
            raise ValueError(
                f"load_batch: {p} has shape {a.shape}, expected {shape}")
    return np.stack(arrs)
