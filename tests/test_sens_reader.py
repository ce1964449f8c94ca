"""Round-trip test for the .sens exporter: synthesize a v4 .sens file, export."""

import os
import struct
import zlib

import numpy as np
import pytest

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from sens_reader import export, iter_frames  # noqa: E402


def _write_sens(path, n_frames=4, dh=24, dw=32, ch=48, cw=64):
    rng = np.random.default_rng(0)
    depths = []
    with open(path, "wb") as f:
        f.write(struct.pack("I", 4))
        name = b"testsensor"
        f.write(struct.pack("Q", len(name)))
        f.write(name)
        for _ in range(4):  # intrinsic/extrinsic color + depth
            f.write(struct.pack("f" * 16, *np.eye(4).ravel()))
        f.write(struct.pack("i", 2))  # jpeg color
        f.write(struct.pack("i", 1))  # zlib_ushort depth
        f.write(struct.pack("I", cw))
        f.write(struct.pack("I", ch))
        f.write(struct.pack("I", dw))
        f.write(struct.pack("I", dh))
        f.write(struct.pack("f", 1000.0))
        f.write(struct.pack("Q", n_frames))
        import imageio

        for i in range(n_frames):
            pose = np.eye(4, dtype=np.float32)
            pose[0, 3] = i
            f.write(struct.pack("f" * 16, *pose.ravel()))
            f.write(struct.pack("Q", i))
            f.write(struct.pack("Q", i))
            depth = rng.integers(0, 8000, (dh, dw)).astype(np.uint16)
            depths.append(depth)
            color = rng.integers(0, 255, (ch, cw, 3)).astype(np.uint8)
            import io as _io

            buf = _io.BytesIO()
            imageio.imwrite(buf, color, format="jpg")
            cbytes = buf.getvalue()
            dbytes = zlib.compress(depth.tobytes())
            f.write(struct.pack("Q", len(cbytes)))
            f.write(struct.pack("Q", len(dbytes)))
            f.write(cbytes)
            f.write(dbytes)
    return depths


def test_sens_parse_and_export(tmp_path):
    sens = str(tmp_path / "scene0001_00.sens")
    depths = _write_sens(sens)
    # streaming parse
    frames = list(iter_frames(sens))
    assert len(frames) == 4
    header = frames[0][0]
    assert header.depth_compression_type == "zlib_ushort"
    d0 = frames[0][2].decompress_depth("zlib_ushort", 24, 32)
    np.testing.assert_array_equal(d0, depths[0])
    # poses carry the frame index
    assert frames[2][2].camera_to_world[0, 3] == pytest.approx(2.0)

    out = str(tmp_path / "out")
    n = export(sens, out, export_depth=True, export_color=True,
               export_poses=True, export_intrinsics=True, frame_skip=2)
    assert n == 2
    import imageio

    png = imageio.imread(os.path.join(out, "depth", "scene0001_00_0.png"))
    np.testing.assert_array_equal(png, depths[0])
    assert os.path.exists(os.path.join(out, "intrinsic", "intrinsic_depth.txt"))
    K = np.loadtxt(os.path.join(out, "intrinsic", "intrinsic_depth.txt"))
    np.testing.assert_allclose(K, np.eye(4))
