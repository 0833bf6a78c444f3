"""Image conversion utilities.

``tensor2im`` defines output-file parity with the reference
(util/util.py:15-24): take batch element 0, map [-1,1] -> [0,255] uint8;
1-channel images are repeated to RGB, 2-channel images get a zero blue
channel appended.  Input here is NHWC (device layout) instead of NCHW.
"""

import os

import numpy as np
from PIL import Image


def tensor2im(image, imtype=np.uint8):
    """image: (N,H,W,C) array-like in [-1,1] -> (H,W,3) uint8."""
    arr = np.asarray(image[0], dtype=np.float32)
    arr = (arr + 1) / 2.0 * 255.0
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    elif arr.shape[-1] == 2:
        arr = np.concatenate(
            [arr, np.zeros(arr.shape[:-1] + (1,), dtype=arr.dtype)], axis=-1)
    return arr.astype(imtype)


def save_image(image_numpy, image_path):
    Image.fromarray(image_numpy).save(image_path)


def diagnose_network(grads, name='network'):
    """Mean absolute gradient across a gradient pytree — the reference's
    manual debugging probe (util/util.py:27-37)."""
    import jax
    leaves = [np.abs(np.asarray(g)).mean()
              for g in jax.tree_util.tree_leaves(grads)]
    mean = float(np.mean(leaves)) if leaves else 0.0
    print(name)
    print(mean)
    return mean


def print_numpy(x, val=True, shp=False):
    """Summary stats printer (reference util/util.py:62-70)."""
    x = np.asarray(x).astype(np.float64)
    if shp:
        print('shape,', x.shape)
    if val:
        x = x.flatten()
        print('mean = %3.3f, min = %3.3f, max = %3.3f, median = %3.3f, '
              'std=%3.3f' % (np.mean(x), np.min(x), np.max(x),
                             np.median(x), np.std(x)))


def varname(p):
    """Name of the variable passed at the call site (reference
    util/util.py:73-78)."""
    import inspect
    import re
    for line in inspect.getframeinfo(inspect.currentframe().f_back)[3]:
        m = re.search(r'\bvarname\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)', line)
        if m:
            return m.group(1)


def info(obj, spacing=10, collapse=1):
    """Print an object's callable methods and doc strings (reference
    util/util.py:44-52)."""
    method_list = [e for e in dir(obj) if callable(getattr(obj, e))]
    fmt = (lambda s: " ".join(s.split())) if collapse else (lambda s: s)
    print("\n".join("%s %s" % (m.ljust(spacing),
                               fmt(str(getattr(obj, m).__doc__)))
                    for m in method_list))


def mkdir(path):
    os.makedirs(path, exist_ok=True)


def mkdirs(paths):
    if isinstance(paths, (list, tuple)):
        for p in paths:
            mkdir(p)
    else:
        mkdir(paths)
