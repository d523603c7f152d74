"""BVH construction (host side, NumPy) -> threaded hit/miss-link arrays.

The reference's canonical GPU layout is a flattened "threaded" BVH with
hit/miss links enabling stackless traversal (`ThreadedBvhNode`,
src/libaten/accelerator/threaded_bvh.h:13-56; SAH build bvh.cpp:213-371;
spatial-split SBVH sbvh.cpp:278-324).  We build a binned-SAH binary BVH
over the primitive (triangle + sphere) bounding boxes and emit the same
kind of flat arrays: pre-order node list where

    next = aabb_hit ? hit_link : miss_link

with leaf nodes holding a [prim_start, prim_count) range into a
reordered primitive-id list.  This is already the TPU-friendly encoding:
traversal becomes a batched gather loop with no per-lane stack.

Spatial splits (SBVH) and the two-level TLAS/BLAS with instance
transforms follow the same node format (threaded_bvh.h exid field) and
are layered on in `aten_tpu.accel.tlas`.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

LEAF_MAX = 4
N_BINS = 16

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_native_lib = None
_native_tried = False


def _load_native():
    """Build (once) and load the C++ builder; None if unavailable."""
    global _native_lib, _native_tried
    if _native_tried:
        return _native_lib
    _native_tried = True
    so = os.path.join(_NATIVE_DIR, "libbvh.so")
    src = os.path.join(_NATIVE_DIR, "bvh_builder.cpp")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(src):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-std=c++17", "-o", so, src],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(so)
        lib.aten_build_bvh.restype = ctypes.c_int64
        lib.aten_build_bvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.aten_build_sbvh.restype = ctypes.c_int64
        lib.aten_build_sbvh.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_int32, ctypes.c_float,
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
        ]
        _native_lib = lib
    except Exception:
        _native_lib = None
    return _native_lib


def _build_bvh_native(bmin, bmax, leaf_max):
    lib = _load_native()
    if lib is None:
        return None
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    P = bmin.shape[0]
    Kmax = 2 * P
    nbmin = np.empty((Kmax, 3), np.float32)
    nbmax = np.empty((Kmax, 3), np.float32)
    hit = np.empty(Kmax, np.int32)
    miss = np.empty(Kmax, np.int32)
    ps = np.empty(Kmax, np.int32)
    pc = np.empty(Kmax, np.int32)
    order = np.empty(P, np.int32)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    K = lib.aten_build_bvh(
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        ctypes.c_int64(P), ctypes.c_int32(leaf_max),
        nbmin.ctypes.data_as(fp), nbmax.ctypes.data_as(fp),
        hit.ctypes.data_as(ip), miss.ctypes.data_as(ip),
        ps.ctypes.data_as(ip), pc.ctypes.data_as(ip),
        order.ctypes.data_as(ip),
    )
    return {
        "nodes_bmin": nbmin[:K].copy(),
        "nodes_bmax": nbmax[:K].copy(),
        "nodes_hit": hit[:K].copy(),
        "nodes_miss": miss[:K].copy(),
        "nodes_prim_start": ps[:K].copy(),
        "nodes_prim_count": pc[:K].copy(),
        "prim_order": order,
    }


def build_sbvh(bmin, bmax, leaf_max: int = LEAF_MAX, alpha: float = 1e-5):
    """Spatial-split BVH (reference sbvh.cpp:278-324 via the native
    builder): primitive REFERENCES may be duplicated into both children
    with clipped boxes when that lowers SAH cost, which tightens trees
    over scenes with large, axis-spanning triangles.  Same output schema
    as build_bvh (prim_order may repeat ids; traversal is agnostic).
    Falls back to the plain SAH build when the native library is
    unavailable or capacities are exceeded."""
    lib = _load_native()
    bmin = np.ascontiguousarray(bmin, np.float32)
    bmax = np.ascontiguousarray(bmax, np.float32)
    P = bmin.shape[0]
    if lib is None or not hasattr(lib, "aten_build_sbvh") or P < 4:
        return build_bvh(bmin, bmax, leaf_max)
    cap_prims = 2 * P
    cap_nodes = 4 * P
    nbmin = np.empty((cap_nodes, 3), np.float32)
    nbmax = np.empty((cap_nodes, 3), np.float32)
    hit = np.empty(cap_nodes, np.int32)
    miss = np.empty(cap_nodes, np.int32)
    ps = np.empty(cap_nodes, np.int32)
    pc = np.empty(cap_nodes, np.int32)
    order = np.empty(cap_prims, np.int32)
    nrefs = np.zeros(1, np.int64)
    fp = ctypes.POINTER(ctypes.c_float)
    ip = ctypes.POINTER(ctypes.c_int32)
    lp = ctypes.POINTER(ctypes.c_int64)
    K = lib.aten_build_sbvh(
        bmin.ctypes.data_as(fp), bmax.ctypes.data_as(fp),
        ctypes.c_int64(P), ctypes.c_int32(leaf_max), ctypes.c_float(alpha),
        ctypes.c_int64(cap_nodes), ctypes.c_int64(cap_prims),
        nbmin.ctypes.data_as(fp), nbmax.ctypes.data_as(fp),
        hit.ctypes.data_as(ip), miss.ctypes.data_as(ip),
        ps.ctypes.data_as(ip), pc.ctypes.data_as(ip),
        order.ctypes.data_as(ip), nrefs.ctypes.data_as(lp),
    )
    if K < 0:
        return build_bvh(bmin, bmax, leaf_max)
    R = int(nrefs[0])
    return {
        "nodes_bmin": nbmin[:K].copy(),
        "nodes_bmax": nbmax[:K].copy(),
        "nodes_hit": hit[:K].copy(),
        "nodes_miss": miss[:K].copy(),
        "nodes_prim_start": ps[:K].copy(),
        "nodes_prim_count": pc[:K].copy(),
        "prim_order": order[:R].copy(),
    }


def _sah_split(bmin, bmax, cent, idx):
    """Pick best binned-SAH split of prims `idx`. Returns (lidx, ridx) or None."""
    c = cent[idx]
    cmin = c.min(axis=0)
    cmax = c.max(axis=0)
    ext = cmax - cmin
    axis = int(np.argmax(ext))
    if ext[axis] <= 1e-12:
        # Degenerate: median split by index order.
        h = len(idx) // 2
        return idx[:h], idx[h:]
    # Bin centroids along the axis.
    scale = N_BINS * (1.0 - 1e-6) / ext[axis]
    bins = ((c[:, axis] - cmin[axis]) * scale).astype(np.int32)
    bins = np.clip(bins, 0, N_BINS - 1)
    # Per-bin counts and bounds.
    counts = np.zeros(N_BINS, np.int64)
    bb_min = np.full((N_BINS, 3), np.inf, np.float32)
    bb_max = np.full((N_BINS, 3), -np.inf, np.float32)
    np.add.at(counts, bins, 1)
    for a in range(3):
        np.minimum.at(bb_min[:, a], bins, bmin[idx, a])
        np.maximum.at(bb_max[:, a], bins, bmax[idx, a])

    def area(mn, mx):
        d = np.maximum(mx - mn, 0.0)
        return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]

    # Prefix/suffix sweeps.
    lmin = np.minimum.accumulate(bb_min, axis=0)
    lmax = np.maximum.accumulate(bb_max, axis=0)
    rmin = np.minimum.accumulate(bb_min[::-1], axis=0)[::-1]
    rmax = np.maximum.accumulate(bb_max[::-1], axis=0)[::-1]
    lcnt = np.cumsum(counts)
    rcnt = np.cumsum(counts[::-1])[::-1]
    # Split after bin k: left bins [0..k], right bins [k+1..].
    cost = np.full(N_BINS - 1, np.inf)
    for k in range(N_BINS - 1):
        if lcnt[k] == 0 or rcnt[k + 1] == 0:
            continue
        cost[k] = area(lmin[k], lmax[k]) * lcnt[k] + area(
            rmin[k + 1], rmax[k + 1]
        ) * rcnt[k + 1]
    k = int(np.argmin(cost))
    if not np.isfinite(cost[k]):
        h = len(idx) // 2
        return idx[:h], idx[h:]
    lmask = bins <= k
    return idx[lmask], idx[~lmask]


def build_bvh(bmin: np.ndarray, bmax: np.ndarray, leaf_max: int = LEAF_MAX,
              use_native: bool = True):
    """Build threaded BVH arrays over P primitive boxes.

    Uses the C++ builder (native/bvh_builder.cpp, compiled on demand) for
    larger scenes; the NumPy path below is the oracle and fallback.

    Returns dict of numpy arrays:
      nodes_bmin/bmax [K,3] f32, nodes_hit/miss [K] i32,
      nodes_prim_start [K] i32 (-1 internal), nodes_prim_count [K] i32,
      prim_order [P] i32.
    """
    bmin = np.asarray(bmin, np.float32)
    bmax = np.asarray(bmax, np.float32)
    P = bmin.shape[0]
    assert P > 0
    if use_native and P > 512:
        out = _build_bvh_native(bmin, bmax, leaf_max)
        if out is not None:
            return out
    cent = (bmin + bmax) * 0.5

    # Recursive build into a pointer tree (children as list indices).
    tree = []  # each: dict(bmin,bmax,left,right,prims)

    def rec(idx):
        nid = len(tree)
        node = {
            "bmin": bmin[idx].min(axis=0),
            "bmax": bmax[idx].max(axis=0),
            "left": -1,
            "right": -1,
            "prims": None,
        }
        tree.append(node)
        if len(idx) <= leaf_max:
            node["prims"] = idx
            return nid
        l, r = _sah_split(bmin, bmax, cent, idx)
        if len(l) == 0 or len(r) == 0:
            h = len(idx) // 2
            l, r = idx[:h], idx[h:]
        node["left"] = rec(l)
        node["right"] = rec(r)
        return nid

    import sys

    old_limit = sys.getrecursionlimit()
    sys.setrecursionlimit(max(old_limit, 100000))
    try:
        rec(np.arange(P, dtype=np.int64))
    finally:
        sys.setrecursionlimit(old_limit)

    # Pre-order flatten with hit/miss (skip) links.
    K = len(tree)
    order = np.empty(K, np.int64)  # preorder position -> tree id
    flat_of = np.empty(K, np.int64)  # tree id -> preorder position
    pos = 0
    skip_of = np.full(K, -1, np.int64)  # preorder position -> skip link

    stack = [(0, -1)]  # (tree id, skip preorder pos placeholder via tree id)
    # We compute skip links in terms of preorder positions; do DFS carrying
    # the "next after my subtree" tree id, resolve to positions afterwards.
    skip_tree = np.full(K, -1, np.int64)
    stack = [(0, -1)]
    while stack:
        tid, skip = stack.pop()
        order[pos] = tid
        flat_of[tid] = pos
        skip_tree[pos] = skip
        pos += 1
        n = tree[tid]
        if n["prims"] is None:
            # preorder: left first -> push right (with same skip), then left
            stack.append((n["right"], skip))
            stack.append((n["left"], n["right"]))
    assert pos == K

    nodes_bmin = np.empty((K, 3), np.float32)
    nodes_bmax = np.empty((K, 3), np.float32)
    nodes_hit = np.empty(K, np.int32)
    nodes_miss = np.empty(K, np.int32)
    nodes_ps = np.full(K, -1, np.int32)
    nodes_pc = np.zeros(K, np.int32)
    prim_order = np.empty(P, np.int64)
    pcur = 0
    for i in range(K):
        n = tree[order[i]]
        nodes_bmin[i] = n["bmin"]
        nodes_bmax[i] = n["bmax"]
        skip = skip_tree[i]
        skip_pos = -1 if skip < 0 else flat_of[skip]
        if n["prims"] is None:
            nodes_hit[i] = i + 1  # first child is next in preorder
            nodes_miss[i] = skip_pos
        else:
            cnt = len(n["prims"])
            prim_order[pcur : pcur + cnt] = n["prims"]
            nodes_ps[i] = pcur
            nodes_pc[i] = cnt
            pcur += cnt
            nodes_hit[i] = skip_pos
            nodes_miss[i] = skip_pos
    assert pcur == P

    return {
        "nodes_bmin": nodes_bmin,
        "nodes_bmax": nodes_bmax,
        "nodes_hit": nodes_hit,
        "nodes_miss": nodes_miss,
        "nodes_prim_start": nodes_ps,
        "nodes_prim_count": nodes_pc,
        "prim_order": prim_order.astype(np.int32),
    }
