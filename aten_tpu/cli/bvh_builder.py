"""Offline BVH build/export tool.

Counterpart of the reference's SbvhBuilder CLI (src/SbvhBuilder/
main.cpp:1-130: load .obj -> build SBVH -> sbvh::exportTree to a .sbvh
cache imported at runtime, accelerator.h:158-176).  Here the cache is a
.npz of the threaded node arrays; SceneBuilder.build(bvh_cache=...)
reuses it when the primitive count matches.

    python -m aten_tpu.cli.bvh_builder model.obj -o model.bvh.npz
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(prog="aten_tpu.cli.bvh_builder")
    p.add_argument("obj")
    p.add_argument("-o", "--output", required=True, help=".npz cache path")
    p.add_argument("--leaf-max", type=int, default=4)
    p.add_argument("--spatial-splits", action="store_true",
                   help="SBVH build (sbvh.cpp role): allow duplicated "
                        "clipped references when they lower SAH cost")
    p.add_argument("--alpha", type=float, default=1e-5,
                   help="spatial-split trigger: child-overlap area over "
                        "root area threshold")
    args = p.parse_args(argv)

    import numpy as np

    from aten_tpu.scene.objloader import load_obj
    from aten_tpu.scene.scene import SceneBuilder

    sb = SceneBuilder()
    load_obj(sb, args.obj)
    t0 = time.perf_counter()
    from aten_tpu.accel.build import build_bvh, build_sbvh

    faces = np.asarray(sb._faces, np.int64)
    pos = np.asarray(sb._vpos, np.float32)
    p0 = pos[faces[:, 0]]
    p1 = pos[faces[:, 1]]
    p2 = pos[faces[:, 2]]
    bmin = np.minimum(np.minimum(p0, p1), p2) - 1e-5
    bmax = np.maximum(np.maximum(p0, p1), p2) + 1e-5
    if args.spatial_splits:
        bvh = build_sbvh(bmin, bmax, leaf_max=args.leaf_max, alpha=args.alpha)
    else:
        bvh = build_bvh(bmin, bmax, leaf_max=args.leaf_max)
    dt = time.perf_counter() - t0
    np.savez_compressed(args.output, **bvh)
    print(
        f"{len(faces)} tris -> {bvh['nodes_bmin'].shape[0]} nodes "
        f"in {dt:.2f}s -> {args.output}",
        file=sys.stderr,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
