"""Native C++ IO runtime (native/): PNG codec, threaded frame prefetcher,
OBJ parser — kept in behavioral lockstep with the pure-Python fallbacks.
"""

import numpy as np
import pytest

from octree_slam_tpu.io import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built")


@pytest.fixture
def tmp_png_pair(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(7)
    depth = rng.integers(0, 60000, (32, 40), dtype=np.uint16)
    rgb = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    dp, rp = str(tmp_path / "d.png"), str(tmp_path / "c.png")
    Image.fromarray(depth).save(dp)
    Image.fromarray(rgb).save(rp)
    return depth, rgb, dp, rp


def test_png_16bit_roundtrip(tmp_png_pair):
    depth, _, dp, _ = tmp_png_pair
    got = native.read_png(dp)
    assert got.dtype == np.uint16
    np.testing.assert_array_equal(got, depth)


def test_png_rgb_roundtrip(tmp_png_pair):
    _, rgb, _, rp = tmp_png_pair
    np.testing.assert_array_equal(native.read_png(rp), rgb)


def test_png_rgba_alpha_stripped(tmp_path):
    from PIL import Image

    rgba = np.dstack([np.full((8, 8), 9, np.uint8)] * 3 +
                     [np.full((8, 8), 200, np.uint8)])
    p = str(tmp_path / "a.png")
    Image.fromarray(rgba).save(p)
    got = native.read_png(p)
    assert got.shape == (8, 8, 3)
    np.testing.assert_array_equal(got, rgba[..., :3])


def test_png_write_then_pil_read(tmp_path):
    from PIL import Image

    rgb = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(8, 6, 3)
    p = str(tmp_path / "w.png")
    native.write_png(p, rgb)
    np.testing.assert_array_equal(np.asarray(Image.open(p)), rgb)


def test_png_missing_file_raises():
    with pytest.raises(IOError):
        native.read_png("/nonexistent/really.png")


def test_prefetcher_in_order_and_scaled(tmp_path):
    from PIL import Image

    n = 7
    dps, rps = [], []
    for i in range(n):
        d = np.full((16, 20), 5000 * (i + 1), np.uint16)
        c = np.full((16, 20, 3), i * 11, np.uint8)
        dp, rp = str(tmp_path / f"d{i}.png"), str(tmp_path / f"c{i}.png")
        Image.fromarray(d).save(dp)
        Image.fromarray(c).save(rp)
        dps.append(dp)
        rps.append(rp)
    with native.FramePrefetcher(dps, rps, 20, 16, depth_to_mm=0.2,
                                n_threads=3, capacity=3) as pf:
        assert len(pf) == n
        for i in range(n):
            depth_mm, rgb = pf.next()
            assert depth_mm[0, 0] == 1000 * (i + 1)
            assert rgb[5, 5, 1] == i * 11
        assert pf.next() is None


def test_prefetcher_shape_mismatch_errors(tmp_path):
    from PIL import Image

    dp, rp = str(tmp_path / "d.png"), str(tmp_path / "c.png")
    Image.fromarray(np.zeros((4, 4), np.uint16)).save(dp)
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(rp)
    with native.FramePrefetcher([dp], [rp], 99, 99) as pf:
        with pytest.raises(IOError):
            pf.next()


def test_obj_native_matches_python(tmp_path):
    from octree_slam_tpu.io.obj import _load_obj_py

    obj = """# test mesh
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vt 0 0
vt 1 0
vt 1 1
vn 0 0 1
vn 0 1 0
f 1/1/1 2/2/1 3/3/1
f 1//2 3//2 4//2
f -5 -4 -1
f 1 2 3 4
"""
    p = str(tmp_path / "m.obj")
    with open(p, "w") as f:
        f.write(obj)
    v, n, fc, uv, lo, hi = native.load_obj_arrays(p)
    m = _load_obj_py(p)
    np.testing.assert_allclose(v, np.asarray(m.vertices))
    np.testing.assert_allclose(n, np.asarray(m.normals), atol=1e-6)
    np.testing.assert_array_equal(fc, np.asarray(m.faces))
    np.testing.assert_allclose(uv, np.asarray(m.texcoords))
    np.testing.assert_allclose(lo, np.asarray(m.bbox.bbox0))
    np.testing.assert_allclose(hi, np.asarray(m.bbox.bbox1))


def test_obj_no_normals_smooth_fallback(tmp_path):
    from octree_slam_tpu.io.obj import _load_obj_py

    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 0 0 2\nf 1 2 3\nf 1 2 4\n"
    p = str(tmp_path / "m.obj")
    with open(p, "w") as f:
        f.write(obj)
    v, n, fc, uv, lo, hi = native.load_obj_arrays(p)
    m = _load_obj_py(p)
    np.testing.assert_allclose(n, np.asarray(m.normals), atol=1e-6)
    assert np.allclose(np.linalg.norm(n, axis=1)[:3], 1.0, atol=1e-5)


def test_tum_prefetched_matches_frame(tmp_path):
    """TUMDataset.prefetched() yields the same frames as frame(i)."""
    from PIL import Image

    from octree_slam_tpu.io.tum import TUMDataset

    root = tmp_path
    (root / "rgb").mkdir()
    (root / "depth").mkdir()
    rng = np.random.default_rng(3)
    rgb_lines, depth_lines = [], []
    for i in range(4):
        t = 100.0 + i * 0.033
        d = rng.integers(0, 30000, (24, 32), dtype=np.uint16)
        c = rng.integers(0, 255, (24, 32, 3), dtype=np.uint8)
        Image.fromarray(d).save(root / "depth" / f"{i}.png")
        Image.fromarray(c).save(root / "rgb" / f"{i}.png")
        depth_lines.append(f"{t} depth/{i}.png")
        rgb_lines.append(f"{t + 0.005} rgb/{i}.png")
    (root / "depth.txt").write_text("\n".join(depth_lines))
    (root / "rgb.txt").write_text("\n".join(rgb_lines))

    ds = TUMDataset(str(root))
    assert len(ds) == 4
    got = list(ds.prefetched())
    assert len(got) == 4
    for i, fr in enumerate(got):
        ref = ds.frame(i)
        np.testing.assert_array_equal(np.asarray(fr.depth),
                                      np.asarray(ref.depth))
        np.testing.assert_array_equal(np.asarray(fr.color),
                                      np.asarray(ref.color))
