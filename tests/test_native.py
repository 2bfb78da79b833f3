"""Native C++ data-path kernels vs Python oracles."""

import numpy as np
import pytest

from hedit_tpu.io_utils import native
from hedit_tpu.io_utils.images import mask_decode


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_rle_decode_matches_python(lib):
    runs = [10, 5, 100, 20, 4090, 10]
    want = mask_decode(runs, image_size=64)
    got = native.rle_decode_native(runs, 64)
    np.testing.assert_array_equal(got, want)


def test_crop_resize_close_to_pil(lib):
    from PIL import Image

    rng = np.random.RandomState(0)
    # smooth image (bicubic boundary handling differs on noise)
    base = rng.rand(8, 10, 3)
    img = np.array(
        Image.fromarray((base * 255).astype(np.uint8)).resize((200, 160))
    )
    got = native.crop_resize_native(img, 64)
    assert got.shape == (64, 64, 3)
    # python oracle via the existing loader path
    h, w = img.shape[:2]
    side = min(h, w)
    top, left = (h - side) // 2 if w < h else 0, (w - side) // 2 if h < w else 0
    crop = img[top : top + side, left : left + side]
    want = np.array(Image.fromarray(crop).resize((64, 64))).astype(np.float32) / 127.5 - 1
    assert np.abs(got - want).mean() < 0.02  # kernels differ slightly at edges


def test_nw_align_matches_python(lib):
    from hedit_tpu.control.p2p_prep import _aligned_mapper, _global_align

    x = [49406, 320, 1125, 539, 2368, 49407]
    y = [49406, 320, 1125, 539, 320, 9999, 2368, 49407]
    tb = _global_align(x, y)
    want = _aligned_mapper(x, y, tb)
    got = native.nw_align_native(x, y)
    np.testing.assert_array_equal(got, want)
