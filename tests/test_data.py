"""Data pipeline tests on a synthetic VNC-like dataset."""

import os

import numpy as np
import pytest
from PIL import Image

from supervised_gan_tpu.data import CreateDataLoader


class Opt:
    """Minimal option namespace for data tests."""
    def __init__(self, dataroot, **kw):
        self.dataroot = dataroot
        self.phase = 'train'
        self.batchSize = 2
        self.loadSize = 32
        self.fineSize = 16
        self.dataset_mode = 'single'
        self.resize_or_crop = 'resize_and_crop'
        self.no_flip = False
        self.no_rotate = False
        self.serial_batches = False
        self.nThreads = 2
        self.max_dataset_size = float('inf')
        self.manualSeed = 0
        self.isTrain = True
        for k, v in kw.items():
            setattr(self, k, v)


@pytest.fixture(scope='module')
def dataroot(tmp_path_factory):
    root = tmp_path_factory.mktemp('vnc')
    for phase in ('train', 'test'):
        d = root / phase
        d.mkdir()
        rng = np.random.RandomState(42)
        for i in range(6):
            arr = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / ('%03d.png' % i)))
    # unaligned dirs
    for sub in ('trainA', 'trainB'):
        d = root / sub
        d.mkdir()
        rng = np.random.RandomState(7)
        for i in range(4):
            arr = rng.randint(0, 255, (48, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(str(d / ('%03d.png' % i)))
    return str(root)


def test_single_loader_shapes_and_range(dataroot):
    loader = CreateDataLoader(Opt(dataroot))
    assert len(loader) == 6
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b['A'].shape == (2, 16, 16, 3)
    assert b['A'].dtype == np.float32
    assert b['A'].min() >= -1.0 and b['A'].max() <= 1.0
    assert len(b['A_paths']) == 2


def test_loader_deterministic_under_seed(dataroot):
    b1 = next(iter(CreateDataLoader(Opt(dataroot))))
    b2 = next(iter(CreateDataLoader(Opt(dataroot))))
    np.testing.assert_array_equal(b1['A'], b2['A'])


def test_loader_serial_order(dataroot):
    loader = CreateDataLoader(Opt(dataroot, serial_batches=True,
                                  no_flip=True, no_rotate=True,
                                  isTrain=False))
    b = next(iter(loader))
    assert b['A_paths'][0].endswith('000.png')
    assert b['A_paths'][1].endswith('001.png')


def test_unaligned_loader(dataroot):
    loader = CreateDataLoader(Opt(dataroot, dataset_mode='unaligned',
                                  batchSize=1))
    b = next(iter(loader))
    assert b['A'].shape == (1, 16, 16, 3)
    assert b['B'].shape == (1, 16, 16, 3)


def test_max_dataset_size(dataroot):
    loader = CreateDataLoader(Opt(dataroot, max_dataset_size=3, batchSize=1))
    assert len(loader) == 3
    assert len(list(loader)) == 3
