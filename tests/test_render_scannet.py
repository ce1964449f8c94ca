"""Data-prep rendering tool + frozen split ingestion (VERDICT missing #1-2).

tools/render_scannet.py mirrors scannet_rendering/render_scannet.ipynb cells
14-26 (pose reflection, scale-2 intrinsics, seed-23 val/test splits); the
numpy fallback rasterizer is validated here on synthetic meshes. Frozen split
lists (splits/scannet/, mirrored from the reference's split_file_names/) are
consumed through --split_files.
"""

import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import render_scannet as RS  # noqa: E402


def _cube_ply_ascii(path, half=0.5):
    v = np.array([[sx, sy, sz] for sx in (-half, half)
                  for sy in (-half, half) for sz in (-half, half)])
    # 12 triangles over the 6 faces (indices into the 2x2x2 corner grid)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
             (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3)]
    faces = []
    for a, b, c, d in quads:
        faces += [(a, b, c), (a, c, d)]
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(v)}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        f.write(f"element face {len(faces)}\n")
        f.write("property list uchar int vertex_indices\nend_header\n")
        for row in v:
            f.write(" ".join(str(float(x)) for x in row) + "\n")
        for tri in faces:
            f.write("3 " + " ".join(map(str, tri)) + "\n")
    return v, np.array(faces)


def test_ply_loader_roundtrip(tmp_path):
    p = str(tmp_path / "cube.ply")
    v, f = _cube_ply_ascii(p)
    verts, faces = RS.load_ply(p)
    np.testing.assert_allclose(verts, v)
    assert faces.shape == (12, 3)


def test_numpy_rasterizer_depth_values(tmp_path):
    # camera at z=-2 (CV convention, looking +z); cube front face at z=-0.2
    # -> expected depth 1.8 m in the face's projection, 0 (hole) outside it
    v, f = _cube_ply_ascii(str(tmp_path / "c.ply"), half=0.2)
    pose = np.eye(4)
    pose[2, 3] = -2.0
    intrinsic = (100.0, 100.0, 32.0, 24.0)
    depth = RS.render_depth_numpy(v, f, pose, intrinsic, scale=1, width=64, height=48)
    assert depth.shape == (48, 64)
    assert depth[24, 32] == pytest.approx(1.8, abs=1e-6)
    assert depth[0, 0] == 0.0 and depth[-1, -1] == 0.0
    # scale=2 doubles the canvas and the intrinsics (notebook cell 21)
    d2 = RS.render_depth_numpy(v, f, pose, intrinsic, scale=2, width=64, height=48)
    assert d2.shape == (96, 128)
    assert d2[48, 64] == pytest.approx(1.8, abs=1e-6)
    # the face half-extent 0.2 at depth 1.8 spans fx*0.2/1.8 = 11.1 px
    assert depth[24, 32 + 10] == pytest.approx(1.8, abs=1e-6)
    assert depth[24, 32 + 15] == 0.0


def test_render_driver_end_to_end(tmp_path):
    imageio = pytest.importorskip("imageio")
    scans = tmp_path / "scans" / "scene0000_00"
    for sub in ("color", "depth", "pose", "intrinsic"):
        (scans / sub).mkdir(parents=True)
    mesh_dir = tmp_path / "meshes" / "scene0000_00"
    mesh_dir.mkdir(parents=True)
    _cube_ply_ascii(str(mesh_dir / "scene0000_00_vh_clean.ply"))

    intr = np.eye(4)
    intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2] = 100, 100, 32, 24
    np.savetxt(str(scans / "intrinsic" / "intrinsic_depth.txt"), intr)
    pose = np.eye(4)
    pose[2, 3] = -2.0
    rng = np.random.default_rng(0)
    for frame in (0, 50, 100):
        imageio.imwrite(str(scans / "color" / f"scene0000_00_{frame}.jpg"),
                        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
        imageio.imwrite(str(scans / "depth" / f"scene0000_00_{frame}.png"),
                        rng.integers(0, 5100, (48, 64), dtype=np.uint16))
        np.savetxt(str(scans / "pose" / f"{frame}.txt"), pose)

    out = tmp_path / "out"
    n = RS.run(str(tmp_path / "scans"), str(tmp_path / "meshes"), str(out),
               scale=1, width=64, height=48, backend="numpy")
    assert n == 3
    # one scene, not in the 5% val draw -> 80/20 per-scene frame split
    gt = (sorted(os.listdir(out / "depths_train_gt"))
          + sorted(os.listdir(out / "depths_test_gt")))
    assert len(gt) == 3
    d = imageio.imread(str(out / ("depths_train_gt" if os.listdir(out / "depths_train_gt")
                                  else "depths_test_gt"))
                       + "/" + gt[0])
    assert d.dtype == np.uint16
    assert d[24, 32] == 1500  # meters x1000 at the cube front face


def test_split_files_ingestion(tmp_path):
    from desr_tpu.data.base_dataset import UnpairedFolderDataset

    # tiny on-disk mirror: 3 A files, 2 B files (+ imgs), one listed-but-missing
    dirs = {}
    for name in ("A_d", "B_d", "A_i", "B_i"):
        d = tmp_path / name
        d.mkdir()
        dirs[name] = str(d)
    for n in ("f1.png", "f2.png", "f3.png"):
        open(os.path.join(dirs["A_d"], n), "w").close()
        open(os.path.join(dirs["A_i"], n.replace(".png", ".jpg")), "w").close()
    for n in ("g1.png", "g2.png"):
        open(os.path.join(dirs["B_d"], n), "w").close()
        open(os.path.join(dirs["B_i"], n.replace(".png", ".jpg")), "w").close()

    sd = tmp_path / "splits"
    sd.mkdir()
    # duplicates (like the published testA_d.txt) and one missing entry
    (sd / "trainA_d.txt").write_text("f1.png\nf2.png\nf1.png\nmissing.png\n")
    (sd / "trainA_i.txt").write_text("f1.jpg\nf2.jpg\nf1.jpg\nmissing.jpg\n")
    (sd / "trainB_d.txt").write_text("g2.png\ng1.png\n")
    (sd / "trainB_i.txt").write_text("g2.jpg\ng1.jpg\n")

    opt = types.SimpleNamespace(
        path_A=dirs["A_d"], path_B=dirs["B_d"],
        A_add_paths=dirs["A_i"], B_add_paths=dirs["B_i"],
        path_A_test="", path_B_test="", A_add_paths_test="", B_add_paths_test="",
        split_files=str(sd), image_and_depth=True, take=0,
        max_dataset_size=float("inf"), use_scannet=True, seed=0)
    ds = UnpairedFolderDataset(opt, stage="train")
    assert [os.path.basename(p) for p in ds.A_paths] == ["f1.png", "f2.png"]
    assert [os.path.basename(p) for p in ds.B_paths] == ["g2.png", "g1.png"]
    assert [os.path.basename(p) for p in ds.A_add_paths] == ["f1.jpg", "f2.jpg"]
    assert len(ds) == 2


def test_shipped_split_lists_are_complete():
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "splits", "scannet")
    want = {"trainA_d.txt": 6222, "trainA_i.txt": 6222,
            "trainB_d.txt": 5946, "trainB_i.txt": 5946,
            "testA_i.txt": 502, "testB_d.txt": 502, "testB_i.txt": 502}
    for fname, n in want.items():
        with open(os.path.join(root, fname)) as f:
            assert sum(1 for _ in f) == n, fname
    # testA_d ships with each name twice; unique count is the real split size
    with open(os.path.join(root, "testA_d.txt")) as f:
        names = [l.strip() for l in f if l.strip()]
    assert len(set(names)) == 502
