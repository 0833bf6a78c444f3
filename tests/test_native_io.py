"""Native PNG decoder tests: bit-exactness vs PIL across PNG variants."""

import numpy as np
import pytest
from PIL import Image

from supervised_gan_tpu.data import native_io


@pytest.fixture(scope='module')
def built():
    if not native_io.available():
        pytest.skip('native toolchain unavailable')
    return True


def roundtrip(tmp_path, img, name):
    p = str(tmp_path / name)
    img.save(p)
    ours = native_io.decode_png(p)
    ref = np.asarray(Image.open(p).convert('RGB'))
    assert ours is not None
    np.testing.assert_array_equal(ours, ref)


def test_rgb(built, tmp_path):
    rng = np.random.RandomState(0)
    roundtrip(tmp_path, Image.fromarray(
        rng.randint(0, 255, (63, 41, 3), dtype=np.uint8)), 'rgb.png')


def test_grey(built, tmp_path):
    rng = np.random.RandomState(1)
    roundtrip(tmp_path, Image.fromarray(
        rng.randint(0, 255, (31, 57), dtype=np.uint8), mode='L'), 'g.png')


def test_rgba(built, tmp_path):
    rng = np.random.RandomState(2)
    roundtrip(tmp_path, Image.fromarray(
        rng.randint(0, 255, (16, 16, 4), dtype=np.uint8), mode='RGBA'),
        'rgba.png')


def test_palette(built, tmp_path):
    rng = np.random.RandomState(3)
    img = Image.fromarray(
        rng.randint(0, 255, (20, 20, 3), dtype=np.uint8)).quantize(32)
    roundtrip(tmp_path, img, 'pal.png')


def test_non_png_falls_back(built, tmp_path):
    assert native_io.decode_png(str(tmp_path / 'missing.png')) is None


def test_loader_uses_native(built, tmp_path):
    from supervised_gan_tpu.data.transforms import load_rgb
    rng = np.random.RandomState(4)
    arr = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    p = str(tmp_path / 'x.png')
    Image.fromarray(arr).save(p)
    img = load_rgb(p)
    np.testing.assert_array_equal(np.asarray(img), arr)
