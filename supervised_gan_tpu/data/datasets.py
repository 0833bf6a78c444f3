"""Datasets: single / aligned / unaligned (reference data/*_dataset.py).

Each dataset's ``get(index, rng)`` returns a dict of HWC float32 arrays in
[-1,1] plus path strings.  The rng is supplied by the loader, derived from
(manualSeed, epoch, index) so augmentation is reproducible.
"""

import os

from .transforms import (build_transform, load_rgb, make_dataset, to_array)


class SingleDataset:
    """Images from <dataroot>/<phase>; the workhorse — the VNC data packs
    label+image into RGB channels of one PNG (reference data/single_dataset.py)."""

    def __init__(self, opt):
        self.opt = opt
        self.dir_A = os.path.join(opt.dataroot, opt.phase)
        self.A_paths = sorted(make_dataset(self.dir_A))
        self.transform = build_transform(opt, opt.isTrain)

    def __len__(self):
        return len(self.A_paths)

    def get(self, index, rng):
        path = self.A_paths[index]
        arr = self.transform(load_rgb(path), rng)
        return {'A': arr, 'A_paths': path}


class AlignedDataset:
    """pix2pix-style A|B side-by-side images: bicubic resize to
    (2*loadSize, loadSize), shared random crop window, coupled flip
    (reference data/aligned_dataset.py:10-50)."""

    def __init__(self, opt):
        from PIL import Image
        self.Image = Image
        self.opt = opt
        assert opt.resize_or_crop == 'resize_and_crop'
        self.dir_AB = os.path.join(opt.dataroot, opt.phase)
        self.AB_paths = sorted(make_dataset(self.dir_AB))

    def __len__(self):
        return len(self.AB_paths)

    def get(self, index, rng):
        opt = self.opt
        path = self.AB_paths[index]
        img = load_rgb(path).resize((opt.loadSize * 2, opt.loadSize),
                                    self.Image.BICUBIC)
        ab = to_array(img)
        h, w_total = ab.shape[:2]
        w = w_total // 2
        # randint semantics of the reference: inclusive upper bound w-fineSize-1
        w_off = int(rng.integers(0, max(0, w - opt.fineSize - 1) + 1))
        h_off = int(rng.integers(0, max(0, h - opt.fineSize - 1) + 1))
        A = ab[h_off:h_off + opt.fineSize, w_off:w_off + opt.fineSize]
        B = ab[h_off:h_off + opt.fineSize, w + w_off:w + w_off + opt.fineSize]
        if not opt.no_flip and rng.random() < 0.5:
            A = A[:, ::-1]
            B = B[:, ::-1]
        return {'A': A.copy(), 'B': B.copy(), 'A_paths': path, 'B_paths': path}


class UnalignedDataset:
    """<phase>A / <phase>B directories with independent indices; the cgan2*
    recipes use the B side for pre-generated fake labels
    (reference data/unaligned_dataset.py:10-50)."""

    def __init__(self, opt):
        self.opt = opt
        self.dir_A = os.path.join(opt.dataroot, opt.phase + 'A')
        self.dir_B = os.path.join(opt.dataroot, opt.phase + 'B')
        self.A_paths = sorted(make_dataset(self.dir_A))
        self.B_paths = sorted(make_dataset(self.dir_B))
        self.A_size = len(self.A_paths)
        self.B_size = len(self.B_paths)
        self.transform = build_transform(opt, opt.isTrain)

    def __len__(self):
        return max(self.A_size, self.B_size)

    def get(self, index, rng):
        A_path = self.A_paths[index % self.A_size]
        B_path = self.B_paths[index % self.B_size]
        A = self.transform(load_rgb(A_path), rng)
        B = self.transform(load_rgb(B_path), rng)
        return {'A': A, 'B': B, 'A_paths': A_path, 'B_paths': B_path}

    def load_images(self, paths, rng=None):
        """Transform a list of image paths (reference unaligned_dataset.py:44-50)."""
        import numpy as np
        rng = rng or np.random.default_rng(0)
        return [self.transform(load_rgb(p), rng) for p in paths]


def CreateDataset(opt):
    if opt.dataset_mode == 'aligned':
        ds = AlignedDataset(opt)
    elif opt.dataset_mode == 'unaligned':
        ds = UnalignedDataset(opt)
    elif opt.dataset_mode == 'single':
        ds = SingleDataset(opt)
    else:
        raise ValueError("Dataset [%s] not recognized." % opt.dataset_mode)
    print("dataset [%s] was created" % type(ds).__name__)
    return ds
