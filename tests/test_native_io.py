"""Native C++ I/O runtime vs the numpy readers."""

import numpy as np
import pytest

from sycl_points_tpu.points import io, native_io
from sycl_points_tpu.points.conversion import read_kitti_bin

RNG = np.random.default_rng(23)
REF = "/root/reference/cpp/data"


@pytest.fixture(scope="module", autouse=True)
def built():
    if not native_io.ensure_built():
        pytest.skip("native library unavailable")


def test_native_ply_matches_numpy_reader():
    a = native_io.read_ply(f"{REF}/source.ply")
    b = io.read_ply(f"{REF}/source.ply")
    np.testing.assert_allclose(a["points"], b["points"])
    np.testing.assert_allclose(a["intensities"], b["intensities"])


def test_native_ascii_ply(tmp_path):
    cloud = {
        "points": RNG.normal(size=(40, 3)).astype(np.float32),
        "intensities": RNG.uniform(size=40).astype(np.float32),
        "normals": RNG.normal(size=(40, 3)).astype(np.float32),
    }
    p = str(tmp_path / "a.ply")
    io.write_ply(p, cloud, binary=False)
    got = native_io.read_ply(p)
    np.testing.assert_allclose(got["points"], cloud["points"], atol=1e-5)
    np.testing.assert_allclose(got["normals"], cloud["normals"], atol=1e-5)


def test_native_kitti(tmp_path):
    raw = RNG.normal(size=(128, 4)).astype(np.float32)
    p = str(tmp_path / "0.bin")
    raw.tofile(p)
    got = native_io.read_kitti_bin(p)
    ref = read_kitti_bin(p)
    np.testing.assert_allclose(got["points"], ref["points"])
    np.testing.assert_allclose(got["intensities"], ref["intensities"])


def test_prefetch_loader(tmp_path):
    paths = []
    for i in range(5):
        raw = np.full((10, 4), float(i), np.float32)
        p = str(tmp_path / f"{i}.bin")
        raw.tofile(p)
        paths.append(p)
    with native_io.PrefetchLoader(paths, prefetch=3) as loader:
        scans = list(loader)
    assert len(scans) == 5
    for i, s in enumerate(scans):
        np.testing.assert_allclose(s["points"], float(i))
