#!/usr/bin/env python3
"""ScanNet .sens exporter — Python-3 data-prep tool.

Re-implements the capability of the reference's Python-2 data-prep pair
(scannet_rendering/SensorData.py + reader.py): parse the ScanNet ``.sens``
binary (version 4: header with color/depth intrinsics+extrinsics, compression
types, sizes, depth shift; then per-frame camera_to_world pose, timestamps and
compressed color/depth payloads) and export:

- depth frames:  zlib-decompressed uint16 mm PNGs, ``<scene>_<frame>.png``
- color frames:  JPEG payloads re-encoded to ``<scene>_<frame>.jpg``
- poses:         4x4 camera_to_world text files
- intrinsics:    intrinsic/extrinsic color+depth text files (the
                 ``intrinsic_depth.txt`` consumed by the training pipeline)

Usage (mirrors reader.py's CLI):
    python tools/sens_reader.py --filename scene0000_00.sens --output_path out \
        --export_depth_images --export_color_images --export_poses \
        --export_intrinsics --frame_skip 50

Streaming: frames are parsed lazily (the reference loads the entire .sens into
RAM; ScanNet scans are multi-GB, so we read/decompress frame-by-frame).
"""

from __future__ import annotations

import argparse
import io
import os
import struct
import zlib

import numpy as np

COMPRESSION_TYPE_COLOR = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
COMPRESSION_TYPE_DEPTH = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort", 2: "occi_ushort"}


class SensHeader:
    def __init__(self, f):
        version = struct.unpack("I", f.read(4))[0]
        if version != 4:
            raise ValueError(f"unsupported .sens version {version}")
        strlen = struct.unpack("Q", f.read(8))[0]
        self.sensor_name = f.read(strlen).decode("ascii", errors="replace")
        self.intrinsic_color = self._mat4(f)
        self.extrinsic_color = self._mat4(f)
        self.intrinsic_depth = self._mat4(f)
        self.extrinsic_depth = self._mat4(f)
        self.color_compression_type = COMPRESSION_TYPE_COLOR[struct.unpack("i", f.read(4))[0]]
        self.depth_compression_type = COMPRESSION_TYPE_DEPTH[struct.unpack("i", f.read(4))[0]]
        self.color_width = struct.unpack("I", f.read(4))[0]
        self.color_height = struct.unpack("I", f.read(4))[0]
        self.depth_width = struct.unpack("I", f.read(4))[0]
        self.depth_height = struct.unpack("I", f.read(4))[0]
        self.depth_shift = struct.unpack("f", f.read(4))[0]
        self.num_frames = struct.unpack("Q", f.read(8))[0]

    @staticmethod
    def _mat4(f):
        return np.asarray(struct.unpack("f" * 16, f.read(64)), dtype=np.float32).reshape(4, 4)


class Frame:
    __slots__ = ("camera_to_world", "timestamp_color", "timestamp_depth",
                 "color_data", "depth_data")

    @classmethod
    def read(cls, f):
        self = cls()
        self.camera_to_world = np.asarray(struct.unpack("f" * 16, f.read(64)),
                                          dtype=np.float32).reshape(4, 4)
        self.timestamp_color = struct.unpack("Q", f.read(8))[0]
        self.timestamp_depth = struct.unpack("Q", f.read(8))[0]
        color_bytes = struct.unpack("Q", f.read(8))[0]
        depth_bytes = struct.unpack("Q", f.read(8))[0]
        self.color_data = f.read(color_bytes)
        self.depth_data = f.read(depth_bytes)
        return self

    def decompress_depth(self, compression_type, h, w):
        if compression_type == "zlib_ushort":
            raw = zlib.decompress(self.depth_data)
        elif compression_type == "raw_ushort":
            raw = self.depth_data
        else:
            raise NotImplementedError(compression_type)
        return np.frombuffer(raw, dtype=np.uint16).reshape(h, w)

    def decompress_color(self, compression_type):
        if compression_type in ("jpeg", "png"):
            import imageio

            return np.asarray(imageio.imread(io.BytesIO(self.color_data)))
        raise NotImplementedError(compression_type)


def iter_frames(path):
    """Yield (header, frame_index, Frame) streaming from disk."""
    with open(path, "rb") as f:
        header = SensHeader(f)
        for i in range(header.num_frames):
            yield header, i, Frame.read(f)


def save_mat(matrix, filename):
    with open(filename, "w") as f:
        for line in matrix:
            np.savetxt(f, line[np.newaxis], fmt="%f")


def export(filename, output_path, export_depth=False, export_color=False,
           export_poses=False, export_intrinsics=False, frame_skip=50,
           image_size=None):
    os.makedirs(output_path, exist_ok=True)
    scene = os.path.basename(filename)[:-5]  # strip .sens
    dirs = {}
    for flag, name in [(export_depth, "depth"), (export_color, "color"),
                       (export_poses, "pose"), (export_intrinsics, "intrinsic")]:
        if flag:
            dirs[name] = os.path.join(output_path, name)
            os.makedirs(dirs[name], exist_ok=True)

    header = None
    n_exported = 0
    for header, i, frame in iter_frames(filename):
        if i % frame_skip != 0:
            continue
        if export_depth:
            import imageio

            depth = frame.decompress_depth(header.depth_compression_type,
                                           header.depth_height, header.depth_width)
            if image_size is not None:
                import cv2

                depth = cv2.resize(depth, (image_size[1], image_size[0]),
                                   interpolation=cv2.INTER_NEAREST)
            imageio.imwrite(os.path.join(dirs["depth"], f"{scene}_{i}.png"), depth)
        if export_color:
            import imageio

            color = frame.decompress_color(header.color_compression_type)
            if image_size is not None:
                import cv2

                color = cv2.resize(color, (image_size[1], image_size[0]),
                                   interpolation=cv2.INTER_NEAREST)
            imageio.imwrite(os.path.join(dirs["color"], f"{scene}_{i}.jpg"), color)
        if export_poses:
            save_mat(frame.camera_to_world, os.path.join(dirs["pose"], f"{i}.txt"))
        n_exported += 1

    if export_intrinsics and header is not None:
        save_mat(header.intrinsic_color, os.path.join(dirs["intrinsic"], "intrinsic_color.txt"))
        save_mat(header.extrinsic_color, os.path.join(dirs["intrinsic"], "extrinsic_color.txt"))
        save_mat(header.intrinsic_depth, os.path.join(dirs["intrinsic"], "intrinsic_depth.txt"))
        save_mat(header.extrinsic_depth, os.path.join(dirs["intrinsic"], "extrinsic_depth.txt"))
    return n_exported


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--filename", required=True, help="path to sens file to read")
    parser.add_argument("--output_path", required=True, help="path to output folder")
    parser.add_argument("--export_depth_images", action="store_true")
    parser.add_argument("--export_color_images", action="store_true")
    parser.add_argument("--export_poses", action="store_true")
    parser.add_argument("--export_intrinsics", action="store_true")
    parser.add_argument("--frame_skip", type=int, default=50)
    opt = parser.parse_args(argv)
    print(opt)
    n = export(opt.filename, opt.output_path,
               export_depth=opt.export_depth_images,
               export_color=opt.export_color_images,
               export_poses=opt.export_poses,
               export_intrinsics=opt.export_intrinsics,
               frame_skip=opt.frame_skip)
    print(f"exported {n} frames")


if __name__ == "__main__":
    main()
