"""Native host runtime (native/libsmallpt_host.so) vs the numpy fallback.

The reference's host native layer is ThreadUtils.h + glutils; ours is the
presentation path (tone map, flip, PPM encode, async frame sink). These tests
pin bit-parity between the C++ and numpy implementations of the reference's
output math (toInt smallpt.cpp:52, flipY :125-134, writeImage :136-142).
"""

import os

import numpy as np
import pytest

from smallpt_tpu.utils import image, native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(42)
    # include out-of-gamut and NaN lanes — tonemap must clamp both
    data = rng.uniform(-0.2, 1.3, size=(37, 53, 3)).astype(np.float32)
    data[0, 0, 0] = np.nan
    return data


def test_tonemap_matches_numpy(img):
    ref = image.to_int(np.nan_to_num(img))
    got = native.tonemap(img)
    assert np.array_equal(ref, got)


def test_flip_matches_numpy(img):
    got = native.flip_y(img.copy())
    assert np.array_equal(got, img[::-1], equal_nan=True)


@pytest.mark.parametrize("binary", [False, True])
def test_write_ppm_roundtrip(tmp_path, img, binary):
    path = str(tmp_path / "out.ppm")
    native.write_ppm(path, img, binary=binary)
    back = image.read_ppm(path)
    assert np.array_equal(back, image.to_int(np.nan_to_num(img)))


def test_python_writer_uses_native_and_matches(tmp_path, img):
    """image.write_ppm dispatches to the native path when built; its output
    must equal the pure-python P3 writer's."""
    clean = np.nan_to_num(img)
    p_native = str(tmp_path / "native.ppm")
    image.write_ppm(p_native, clean, flip=True)
    os.environ["SMALLPT_TPU_NO_NATIVE"] = "1"
    try:
        # force a fresh numpy-path module state
        native._LIB, native._TRIED = None, False
        p_py = str(tmp_path / "py.ppm")
        image.write_ppm(p_py, clean, flip=True)
    finally:
        del os.environ["SMALLPT_TPU_NO_NATIVE"]
        native._LIB, native._TRIED = None, False
    a = image.read_ppm(p_native)
    b = image.read_ppm(p_py)
    assert np.array_equal(a, b)


def test_frame_writer_async(tmp_path, img):
    pattern = str(tmp_path / "frame_%04d.ppm")
    with native.FrameWriter(pattern, img.shape[1], img.shape[0], binary=True,
                            max_queue=2) as fw:
        for i in range(8):
            fw.push(img, i)
        assert fw.errors == 0
    for i in range(8):
        assert os.path.exists(pattern % i)
    back = image.read_ppm(pattern % 7)
    assert np.array_equal(back, image.to_int(np.nan_to_num(img)))
