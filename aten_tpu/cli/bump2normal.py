"""Height (bump) map -> tangent-space normal map.

Counterpart of the reference's Bump2Normal tool (src/tools/Bump2Normal
+ shader/bump_2_normal_fs.glsl): central-difference height gradients
packed into [0,1] RGB.

    python -m aten_tpu.cli.bump2normal height.png -o normal.png --scale 2
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def bump_to_normal(height, scale=1.0):
    """height [H,W] (0..1) -> normal map [H,W,3] in [0,1]."""
    h = np.asarray(height, np.float32)
    dx = (np.roll(h, -1, axis=1) - np.roll(h, 1, axis=1)) * 0.5 * scale
    dy = (np.roll(h, -1, axis=0) - np.roll(h, 1, axis=0)) * 0.5 * scale
    n = np.stack([-dx, dy, np.ones_like(h)], axis=-1)
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    return n * 0.5 + 0.5


def main(argv=None):
    p = argparse.ArgumentParser(prog="aten_tpu.cli.bump2normal")
    p.add_argument("input")
    p.add_argument("-o", "--output", required=True)
    p.add_argument("--scale", type=float, default=1.0)
    args = p.parse_args(argv)

    from aten_tpu.io.image import load_image, save_image

    img = load_image(args.input, srgb_to_linear=False)
    height = img.mean(axis=-1)
    n = bump_to_normal(height, args.scale)
    # normal maps are data: write raw values, undoing save_image's OETF
    x = np.clip(n, 0.0, 1.0)
    lin = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
    save_image(args.output, lin)
    print(f"wrote {args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
