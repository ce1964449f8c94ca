#!/usr/bin/env python3
"""Render HQ ground-truth depth from BundleFusion meshes (domain-A data prep).

Reimplements the reference's `scannet_rendering/render_scannet.ipynb` cells
14-26 as a script:

- per scene: load `<scene>_vh_clean.ply`, render depth at ``scale``x the
  640x480 sensor resolution (default scale=2 -> 1280x960) for every exported
  frame pose, with the notebook's y/z-reflected camera poses
  (``pose @ diag(1,-1,-1,1)``: ScanNet poses are CV-convention camera->world,
  pyrender wants OpenGL) and intrinsics scaled by ``scale``;
- 5%% of scenes -> val split (np.random.seed(23), cell 22); remaining scenes
  split per-scene into 80%% train / 20%% test frames (seed 23, cell 26);
- outputs: raw color -> images_<split>/, raw depth -> depths_<split>/,
  rendered depth (meters x1000, uint16) -> depths_<split>_gt/.

Rendering backends:
- **pyrender** (+trimesh), exactly like the notebook — used when importable
  (production path; install in the offline data-prep env).
- **numpy fallback**: a built-in z-buffer triangle rasterizer + minimal PLY
  loader, so the capability works (and is testable) without GL. CV-convention
  projection with the UNREFLECTED pose is mathematically identical to the
  notebook's reflect+OpenGL dance. Intended for small meshes / CI; for full
  ScanNet scans use pyrender.

Usage:
    python tools/render_scannet.py --scans_dir <exported .sens frames> \
        --mesh_dir <folder with <scene>/<scene>_vh_clean.ply> \
        --output <save folder> [--scale 2] [--backend auto|pyrender|numpy]
"""

from __future__ import annotations

import argparse
import glob
import os
import struct
import sys

import numpy as np

REFL = np.diag([1.0, -1.0, -1.0, 1.0])  # notebook cell 14: y/z reflection


# --------------------------------------------------------------------- PLY


def load_ply(path):
    """Minimal PLY mesh loader: vertices (x,y,z) + triangular faces.

    Supports ascii and binary_little_endian, ignoring extra properties —
    enough for ScanNet `_vh_clean.ply` and test fixtures. (trimesh replaces
    this when the pyrender backend is active.)
    """
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"{path}: not a PLY file")
        fmt = None
        elements = []  # (name, count, [(prop_type, prop_name) or ('list', idx_type, cnt_type, name)])
        while True:
            line = f.readline().strip().decode("ascii")
            if line.startswith("format"):
                fmt = line.split()[1]
            elif line.startswith("element"):
                _, name, count = line.split()
                elements.append([name, int(count), []])
            elif line.startswith("property"):
                parts = line.split()
                if parts[1] == "list":
                    elements[-1][2].append(("list", parts[2], parts[3], parts[4]))
                else:
                    elements[-1][2].append((parts[1], parts[2]))
            elif line == "end_header":
                break

        np_t = {"float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
                "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
                "short": "i2", "ushort": "u2", "char": "i1", "uchar": "u1",
                "uint8": "u1", "int8": "i1"}
        verts, faces = None, None
        for name, count, props in elements:
            has_list = any(p[0] == "list" for p in props)
            if fmt == "ascii":
                rows = [f.readline().split() for _ in range(count)]
                if name == "vertex":
                    idx = [i for i, p in enumerate(props) if p[1] in ("x", "y", "z")]
                    verts = np.array([[float(r[i]) for i in idx] for r in rows], np.float64)
                elif name == "face":
                    faces = np.array([[int(v) for v in r[1:1 + int(r[0])]] for r in rows], np.int64)
            else:
                if not has_list:
                    dt = np.dtype([(p[1], "<" + np_t[p[0]]) for p in props])
                    data = np.frombuffer(f.read(dt.itemsize * count), dt)
                    if name == "vertex":
                        verts = np.stack([data["x"], data["y"], data["z"]], -1).astype(np.float64)
                else:
                    rows = []
                    for _ in range(count):
                        row = []
                        for p in props:
                            if p[0] == "list":
                                cnt_dt = "<" + np_t[p[1]]
                                idx_dt = "<" + np_t[p[2]]
                                n = int(np.frombuffer(f.read(np.dtype(cnt_dt).itemsize), cnt_dt)[0])
                                vals = np.frombuffer(f.read(np.dtype(idx_dt).itemsize * n), idx_dt)
                                if p[3] in ("vertex_indices", "vertex_index"):
                                    row = list(vals)
                            else:
                                f.read(np.dtype("<" + np_t[p[0]]).itemsize)
                        rows.append(row)
                    if name == "face":
                        faces = np.array(rows, np.int64)
        if verts is None or faces is None:
            raise ValueError(f"{path}: missing vertex or face element")
        if faces.shape[1] != 3:
            raise ValueError("only triangle meshes supported")
        return verts, faces


# ------------------------------------------------------- numpy rasterizer


def render_depth_numpy(verts, faces, pose, intrinsic, scale=2, width=640, height=480,
                       znear=0.05, zfar=100.0):
    """Z-buffer rasterize depth (meters), CV convention.

    ``pose`` is the raw ScanNet camera->world matrix (the notebook's
    ``pose @ REFL`` + OpenGL camera is equivalent to CV projection with the
    raw pose). Depth is linearly interpolated in screen space via
    perspective-correct barycentrics, hidden surfaces resolved by z-buffer.
    """
    W, H = int(scale * width), int(scale * height)
    fx, fy, cx, cy = [v * scale for v in intrinsic]
    world2cam = np.linalg.inv(pose)
    v_cam = verts @ world2cam[:3, :3].T + world2cam[:3, 3]
    z = v_cam[:, 2]
    u = fx * v_cam[:, 0] / np.where(z != 0, z, 1e-9) + cx
    v = fy * v_cam[:, 1] / np.where(z != 0, z, 1e-9) + cy

    depth = np.zeros((H, W), np.float64)
    zbuf = np.full((H, W), np.inf)
    tri_u, tri_v, tri_z = u[faces], v[faces], z[faces]
    # cull triangles fully behind the camera or out of frustum
    keep = (tri_z > znear).all(1) & (tri_z < zfar).any(1)
    keep &= (tri_u.max(1) >= 0) & (tri_u.min(1) < W) & (tri_v.max(1) >= 0) & (tri_v.min(1) < H)
    for uu, vv, zz in zip(tri_u[keep], tri_v[keep], tri_z[keep]):
        x0, x1 = int(max(np.floor(uu.min()), 0)), int(min(np.ceil(uu.max()) + 1, W))
        y0, y1 = int(max(np.floor(vv.min()), 0)), int(min(np.ceil(vv.max()) + 1, H))
        if x0 >= x1 or y0 >= y1:
            continue
        px, py = np.meshgrid(np.arange(x0, x1) + 0.5, np.arange(y0, y1) + 0.5)
        d = (uu[1] - uu[0]) * (vv[2] - vv[0]) - (uu[2] - uu[0]) * (vv[1] - vv[0])
        if abs(d) < 1e-12:
            continue
        w1 = ((px - uu[0]) * (vv[2] - vv[0]) - (uu[2] - uu[0]) * (py - vv[0])) / d
        w2 = ((uu[1] - uu[0]) * (py - vv[0]) - (px - uu[0]) * (vv[1] - vv[0])) / d
        w0 = 1.0 - w1 - w2
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
        if not inside.any():
            continue
        # perspective-correct depth: interpolate 1/z
        inv_z = w0 / zz[0] + w1 / zz[1] + w2 / zz[2]
        z_pix = np.where(inv_z > 0, 1.0 / np.maximum(inv_z, 1e-12), np.inf)
        z_pix = np.where(inside, z_pix, np.inf)
        sub_z = zbuf[y0:y1, x0:x1]
        closer = z_pix < sub_z
        sub_z[closer] = z_pix[closer]
        depth[y0:y1, x0:x1][closer] = z_pix[closer]
    depth[~np.isfinite(depth)] = 0.0
    return depth


# --------------------------------------------------------- pyrender backend


def make_renderer(backend, scale, width, height):
    """Return (render_fn(mesh_path, pose, intrinsic) -> depth_m, backend)."""
    if backend in ("auto", "pyrender"):
        try:
            import trimesh
            import pyrender

            r = pyrender.OffscreenRenderer(scale * width, scale * height)
            scene = pyrender.Scene()
            mesh_cache = {}

            def render(mesh_path, pose, intrinsic):
                if mesh_path not in mesh_cache:
                    mesh_cache.clear()
                    mesh_cache[mesh_path] = pyrender.Mesh.from_trimesh(
                        trimesh.load_mesh(mesh_path))
                fx, fy, cx, cy = [v * scale for v in intrinsic]
                camera = pyrender.IntrinsicsCamera(fx, fy, cx, cy)
                scene.clear()
                scene.add(mesh_cache[mesh_path])
                scene.add(camera, pose=pose @ REFL)  # notebook cell 21
                _, depth = r.render(scene)
                return depth

            return render, "pyrender"
        except ImportError:
            if backend == "pyrender":
                raise SystemExit("pyrender/trimesh not installed; use --backend numpy")

    mesh_cache = {}

    def render(mesh_path, pose, intrinsic):
        if mesh_path not in mesh_cache:
            mesh_cache.clear()
            mesh_cache[mesh_path] = load_ply(mesh_path)
        verts, faces = mesh_cache[mesh_path]
        return render_depth_numpy(verts, faces, pose, intrinsic, scale, width, height)

    return render, "numpy"


# ------------------------------------------------------------------ driver


def run(scans_dir, mesh_dir, output, scale=2, width=640, height=480,
        val_frac=0.05, backend="auto", imwrite=None):
    if imwrite is None:
        import imageio.v2 as imageio

        imwrite = imageio.imwrite
        imread = imageio.imread
    else:
        imread = None
    render, backend = make_renderer(backend, scale, width, height)
    print(f"render backend: {backend}")

    folders = sorted(glob.glob(os.path.join(scans_dir, "*")))
    folders = [f for f in folders if os.path.isdir(f)]
    np.random.seed(23)  # notebook cell 22
    val_folders = np.random.choice(len(folders), int(len(folders) * val_frac),
                                   replace=False)
    for sub in ("images_val", "depths_val", "depths_val_gt",
                "images_train", "depths_train", "depths_train_gt",
                "images_test", "depths_test", "depths_test_gt"):
        os.makedirs(os.path.join(output, sub), exist_ok=True)

    n_done = 0
    for indx, fold in enumerate(folders):
        images = sorted(glob.glob(fold + "/color/*"))
        depthes = sorted(glob.glob(fold + "/depth/*"))
        poses = sorted(glob.glob(fold + "/pose/*"))
        intr = np.loadtxt(os.path.join(fold, "intrinsic", "intrinsic_depth.txt"))
        intrinsic = (intr[0, 0], intr[1, 1], intr[0, 2], intr[1, 2])
        pose_ids = [int(os.path.basename(p).split(".")[0]) for p in poses]
        scene = os.path.basename(fold)
        mesh_path = os.path.join(mesh_dir, scene, f"{scene}_vh_clean.ply")
        if not os.path.exists(mesh_path):
            print(f"skip {scene}: no mesh at {mesh_path}", file=sys.stderr)
            continue

        if indx in val_folders:
            split_of = lambda i: "val"
        else:
            np.random.seed(23)  # notebook cell 26: per-scene 80/20 frame split
            train_idx = set(np.random.choice(len(images), len(images) * 4 // 5,
                                             replace=False).tolist())
            split_of = lambda i: "train" if i in train_idx else "test"

        for i in range(len(images)):
            frame = int(os.path.basename(depthes[i]).split("_")[-1].split(".")[0])
            pose = np.loadtxt(poses[pose_ids.index(frame)])
            try:
                d_gt = render(mesh_path, pose, intrinsic)
            except Exception as e:  # notebook: log and continue
                with open(os.path.join(output, "exeptions.txt"), "a") as g:
                    print(f"index: {indx}, fold: {fold}: {e}", file=g)
                continue
            split = split_of(i)
            name_i = os.path.basename(images[i])
            name_d = os.path.basename(depthes[i])
            if imread is not None:
                imwrite(os.path.join(output, f"images_{split}", name_i), imread(images[i]))
                imwrite(os.path.join(output, f"depths_{split}", name_d), imread(depthes[i]))
            imwrite(os.path.join(output, f"depths_{split}_gt", name_d),
                    (d_gt * 1000).astype(np.uint16))
            n_done += 1
    print(f"rendered {n_done} frames")
    return n_done


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("--scans_dir", required=True,
                    help="folder of per-scene .sens exports (color/ depth/ pose/ intrinsic/)")
    ap.add_argument("--mesh_dir", required=True,
                    help="folder with <scene>/<scene>_vh_clean.ply meshes")
    ap.add_argument("--output", required=True)
    ap.add_argument("--scale", type=int, default=2)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--val_frac", type=float, default=0.05)
    ap.add_argument("--backend", choices=["auto", "pyrender", "numpy"], default="auto")
    a = ap.parse_args(argv)
    run(a.scans_dir, a.mesh_dir, a.output, a.scale, a.width, a.height,
        a.val_frac, a.backend)


if __name__ == "__main__":
    main()
