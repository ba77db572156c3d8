"""Native C++ loader: PNG codec round-trips, association parity with the
Python implementation, and the threaded prefetch stream on a generated
mini TUM sequence (SURVEY.md §2.1 — the reference's data path is native
C++ via ROS playback; ours is native/)."""

import os

import numpy as np
import pytest

from pop_up_slam_tpu.evaluation.ate import associate as py_associate
from pop_up_slam_tpu.io import native_loader as nl

pytestmark = pytest.mark.skipif(
    not nl.available(), reason=f"native lib unavailable: {nl.load_error()}"
)


def test_png_roundtrip_rgb(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(37, 53, 3), dtype=np.uint8)
    p = str(tmp_path / "rgb.png")
    nl.encode_png(p, img)
    back = nl.decode_png(p)
    np.testing.assert_array_equal(back, img)


def test_png_roundtrip_gray16(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.integers(0, 65536, size=(25, 31), dtype=np.uint16)
    p = str(tmp_path / "depth.png")
    nl.encode_png(p, img)
    back = nl.decode_png(p)
    assert back.dtype == np.uint16
    np.testing.assert_array_equal(back, img)


def test_png_interop_with_pil(tmp_path):
    """Native decode of a PIL-written file and vice versa."""
    from PIL import Image

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, size=(20, 24, 3), dtype=np.uint8)
    p1 = str(tmp_path / "pil.png")
    Image.fromarray(img).save(p1)
    np.testing.assert_array_equal(nl.decode_png(p1), img)

    p2 = str(tmp_path / "native.png")
    nl.encode_png(p2, img)
    with Image.open(p2) as im:
        np.testing.assert_array_equal(np.asarray(im), img)


def test_associate_matches_python():
    rng = np.random.default_rng(3)
    a = np.sort(rng.uniform(0, 10, 40))
    b = np.sort(rng.uniform(0, 10, 55))
    got = nl.associate(a, b, 0.1)
    want = py_associate(a, b, 0.1)
    assert got == want


def _make_mini_sequence(root, n=12, h=16, w=20):
    os.makedirs(os.path.join(root, "rgb"))
    rng = np.random.default_rng(7)
    lines = ["# color images", "# timestamp filename"]
    imgs = []
    for i in range(n):
        stamp = 100.0 + i * 0.05
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        rel = f"rgb/{stamp:.6f}.png"
        nl.encode_png(os.path.join(root, rel), img)
        lines.append(f"{stamp:.6f} {rel}")
        imgs.append((stamp, img))
    with open(os.path.join(root, "rgb.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(os.path.join(root, "groundtruth.txt"), "w") as f:
        f.write("# gt\n")
        for i in range(n):
            stamp = 100.0 + i * 0.05 + 0.001
            f.write(f"{stamp:.6f} {i * 0.1:.4f} 0 0 0 0 0 1\n")
    return imgs


def test_sequence_metadata_and_stream(tmp_path):
    root = str(tmp_path / "seq")
    imgs = _make_mini_sequence(root)
    with nl.NativeSequence(root) as seq:
        assert seq.num_rgb == len(imgs)
        assert seq.num_gt == len(imgs)
        np.testing.assert_allclose(
            seq.stamps("rgb"), [s for s, _ in imgs], atol=1e-6
        )
        gt = seq.gt_poses()
        assert gt.shape == (len(imgs), 7)
        np.testing.assert_allclose(gt[:, 0], 0.1 * np.arange(len(imgs)))

        got = list(seq.stream(num_threads=3, lookahead=4))
        assert len(got) == len(imgs)
        for (s_got, img_got), (s_want, img_want) in zip(got, imgs):
            assert abs(s_got - s_want) < 1e-6
            np.testing.assert_array_equal(img_got, img_want)


def test_stream_subset_indices(tmp_path):
    root = str(tmp_path / "seq2")
    imgs = _make_mini_sequence(root, n=8)
    with nl.NativeSequence(root) as seq:
        sel = [5, 1, 6]
        got = list(seq.stream(indices=sel, num_threads=2, lookahead=2))
        assert len(got) == 3
        for k, i in enumerate(sel):
            np.testing.assert_array_equal(got[k][1], imgs[i][1])


def test_decode_missing_file_raises():
    with pytest.raises(RuntimeError):
        nl.decode_png("/nonexistent/file.png")
