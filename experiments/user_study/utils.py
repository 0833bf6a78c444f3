"""Dataset-preparation utilities for the user study.

Python equivalents of the reference's MATLAB helpers
(reference experiments/user_study/utils/close_memb.m and
remove_small_mito.m), built on scipy.ndimage instead of the Image
Processing Toolbox:

- ``close_memb``: for every PNG in a directory, re-draw the membrane
  channel (channel 0) as the dilated edge of the central enclosed
  region — select the background component containing ``center`` after
  dilating the membrane mask by a disk of radius ``gap`` (MATLAB
  ``bwselect(~imdilate(m, strel('disk', gap)), cx, cy)``), dilate it by
  ``width``, then write the dilated edge of that region back
  (close_memb.m:1-18).
- ``remove_small_mito``: delete PNGs whose mitochondria channel
  (channel 1) has fewer than ``min_px`` nonzero pixels
  (remove_small_mito.m:1-12).

Both operate in place on a directory of ``*.png``, like the originals.
"""

import glob
import os

import numpy as np
from scipy import ndimage


def disk(radius):
    """Boolean disk structuring element, MATLAB ``strel('disk', r)``
    flat approximation (here: exact Euclidean disk, which matches the
    intent; strel's decimated approximation differs by boundary pixels
    only)."""
    r = int(radius)
    yy, xx = np.ogrid[-r:r + 1, -r:r + 1]
    return (yy * yy + xx * xx) <= r * r


def _imread(path):
    from PIL import Image
    return np.array(Image.open(path).convert('RGB'))


def _imwrite(arr, path):
    from PIL import Image
    Image.fromarray(arr).save(path)


def bwselect(mask, x, y):
    """Connected component of ``mask`` (bool, 8-connected like MATLAB's
    default) containing pixel (row=y, col=x); all-False if the seed is
    outside the mask."""
    lab, _ = ndimage.label(mask, structure=np.ones((3, 3), bool))
    seed = lab[int(y), int(x)]
    if seed == 0:
        return np.zeros_like(mask)
    return lab == seed


def binary_edge(mask):
    """Boundary pixels of a boolean mask (mask minus its erosion) —
    stand-in for MATLAB ``edge`` applied to a logical image."""
    er = ndimage.binary_erosion(mask, structure=np.ones((3, 3), bool),
                                border_value=0)
    return mask & ~er


def close_memb(src, gap=4, width=3, center=(512, 512), verbose=True):
    """Close the membrane ring around the central region in every PNG
    under ``src`` (in place).  Mirrors close_memb.m with its defaults
    (gap=4, width=3, center=[512 512]); ``center`` is (row, col)."""
    for path in sorted(glob.glob(os.path.join(src, '*.png'))):
        a = _imread(path)
        m = a[:, :, 0] > 0
        grown = ndimage.binary_dilation(m, structure=disk(gap))
        region = bwselect(~grown, center[1], center[0])
        region = ndimage.binary_dilation(region, structure=disk(width))
        ring = ndimage.binary_dilation(binary_edge(region),
                                       structure=disk(4))
        a[:, :, 0] = ring.astype(np.uint8) * 255
        _imwrite(a, path)
        if verbose:
            print('--> %s' % os.path.basename(path))


def remove_small_mito(src, min_px=64, verbose=True):
    """Delete every PNG under ``src`` whose channel-1 (mitochondria)
    mask has fewer than ``min_px`` nonzero pixels
    (remove_small_mito.m: nnz(A(:,:,2)) < 64)."""
    removed = []
    for path in sorted(glob.glob(os.path.join(src, '*.png'))):
        a = _imread(path)
        if np.count_nonzero(a[:, :, 1]) < min_px:
            os.remove(path)
            removed.append(path)
        if verbose:
            print('--> %s' % os.path.basename(path))
    return removed
