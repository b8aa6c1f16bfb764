"""libhsio native IO tests: builds the shared library with the in-tree
Makefile and asserts equivalence with the pure-Python IO paths."""

import numpy as np
import pytest

from opticalflowhs_tpu.io import flo as pyflo
from opticalflowhs_tpu.io import images as pyimages
from opticalflowhs_tpu.io import native


@pytest.fixture(scope="session")
def hsio():
    if not native.build():
        pytest.skip("no C++ toolchain available to build libhsio")
    if not native.available():
        pytest.skip("libhsio built but failed to load")
    return native


def test_load_gray_matches_python_pgm(hsio, tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (37, 53)).astype(np.float32)
    p = str(tmp_path / "t.pgm")
    pyimages.save_image(p, img)
    a = hsio.load_gray(p)
    b = pyimages.load_gray(p)
    np.testing.assert_array_equal(a, b)
    assert a.dtype == np.float32


def test_load_gray_matches_python_ppm_color(hsio, tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (16, 24, 3)).astype(np.float32)
    p = str(tmp_path / "t.ppm")
    pyimages.save_image(p, img)
    a = hsio.load_gray(p)
    b = pyimages.load_gray(p)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_flo_roundtrip_cross_implementation(hsio, tmp_path):
    rng = np.random.default_rng(2)
    f = rng.normal(size=(19, 31, 2)).astype(np.float32)
    p_native = str(tmp_path / "n.flo")
    p_python = str(tmp_path / "p.flo")
    hsio.write_flo(p_native, f)
    pyflo.write_flo(p_python, f)
    with open(p_native, "rb") as a, open(p_python, "rb") as b:
        assert a.read() == b.read(), "native and python .flo bytes differ"
    np.testing.assert_array_equal(hsio.read_flo(p_python), f)
    np.testing.assert_array_equal(pyflo.read_flo(p_native), f)


def test_stream_frames_order_and_content(hsio, tmp_path):
    rng = np.random.default_rng(3)
    paths = []
    want = []
    for k in range(12):
        img = rng.uniform(0, 1, (20, 32)).astype(np.float32)
        p = str(tmp_path / f"f{k:03d}.pgm")
        pyimages.save_image(p, img)
        paths.append(p)
        want.append(pyimages.load_gray(p))
    got = list(hsio.stream_frames(paths, n_threads=3, prefetch=4))
    assert len(got) == 12
    for k in range(12):
        np.testing.assert_array_equal(got[k], want[k])


def test_stream_frames_empty(hsio):
    assert list(hsio.stream_frames([])) == []


def test_load_gray_missing_file_raises(hsio):
    with pytest.raises(IOError):
        hsio.load_gray("/nonexistent/x.pgm")
