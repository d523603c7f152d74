"""Environment-map projection converter.

Counterpart of the reference's EnvmapConverter tool (src/tools/
EnvmapConverter): resamples between equirectangular, vertical-cross
cubemap, and mirror-ball layouts.

    python -m aten_tpu.cli.envmap_converter in.hdr -o out.hdr \
        --from mirrorball --to equirect --width 1024
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def _dirs_equirect(W, H):
    u = (np.arange(W) + 0.5) / W
    v = (np.arange(H) + 0.5) / H
    uu, vv = np.meshgrid(u, v)
    phi = (uu - 0.5) * 2 * np.pi
    theta = vv * np.pi
    st = np.sin(theta)
    return np.stack([st * np.sin(phi), np.cos(theta), -st * np.cos(phi)], -1)


def _sample_equirect(img, d):
    H, W = img.shape[:2]
    phi = np.arctan2(d[..., 0], -d[..., 2])
    theta = np.arccos(np.clip(d[..., 1], -1, 1))
    x = np.clip(((phi / (2 * np.pi) + 0.5) * W).astype(int), 0, W - 1)
    y = np.clip((theta / np.pi * H).astype(int), 0, H - 1)
    return img[y, x]


def _sample_mirrorball(img, d):
    """Mirror-ball photo: ball at origin viewed from +z; direction d maps
    to the ball normal h = normalize(d + z)."""
    H, W = img.shape[:2]
    z = np.array([0.0, 0.0, 1.0])
    h = d + z
    h /= np.maximum(np.linalg.norm(h, axis=-1, keepdims=True), 1e-9)
    x = np.clip(((h[..., 0] * 0.5 + 0.5) * W).astype(int), 0, W - 1)
    y = np.clip(((-h[..., 1] * 0.5 + 0.5) * H).astype(int), 0, H - 1)
    return img[y, x]


_FACES = {  # vertical cross layout: (col, row), forward/right/up per face
    "+x": ((2, 1), [1, 0, 0], [0, 0, -1], [0, 1, 0]),
    "-x": ((0, 1), [-1, 0, 0], [0, 0, 1], [0, 1, 0]),
    "+y": ((1, 0), [0, 1, 0], [1, 0, 0], [0, 0, 1]),
    "-y": ((1, 2), [0, -1, 0], [1, 0, 0], [0, 0, -1]),
    "+z": ((1, 1), [0, 0, 1], [1, 0, 0], [0, 1, 0]),
    "-z": ((1, 3), [0, 0, -1], [-1, 0, 0], [0, 1, 0]),
}


def _cross_to_dirs(face_size):
    """Direction field of a 3x4 vertical-cross cubemap image."""
    s = face_size
    d = np.zeros((4 * s, 3 * s, 3), np.float32)
    mask = np.zeros((4 * s, 3 * s), bool)
    uv = (np.arange(s) + 0.5) / s * 2 - 1
    uu, vv = np.meshgrid(uv, uv)
    for (c, r), f, rt, up in _FACES.values():
        f, rt, up = map(np.asarray, (f, rt, up))
        dirs = f[None, None] + uu[..., None] * rt + -vv[..., None] * up
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        d[r * s : (r + 1) * s, c * s : (c + 1) * s] = dirs
        mask[r * s : (r + 1) * s, c * s : (c + 1) * s] = True
    return d, mask


def main(argv=None):
    p = argparse.ArgumentParser(prog="aten_tpu.cli.envmap_converter")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--from", dest="src", default="equirect",
                   choices=["equirect", "mirrorball"])
    p.add_argument("--to", dest="dst", default="equirect",
                   choices=["equirect", "cross"])
    p.add_argument("--width", type=int, default=1024,
                   help="output width (equirect) or face size (cross)")
    args = p.parse_args(argv)

    from aten_tpu.io.image import load_image, save_image

    img = load_image(args.input, srgb_to_linear=not args.input.endswith(".hdr"))
    sample = {"equirect": _sample_equirect, "mirrorball": _sample_mirrorball}[
        args.src
    ]
    if args.dst == "equirect":
        W = args.width
        H = W // 2
        out = sample(img, _dirs_equirect(W, H))
    else:
        d, mask = _cross_to_dirs(args.width)
        out = np.where(mask[..., None], sample(img, d), 0.0)
    save_image(args.output, out.astype(np.float32))
    print(f"wrote {args.output} {out.shape}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
