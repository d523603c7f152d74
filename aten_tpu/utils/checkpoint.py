"""Render-state checkpoint / resume.

The reference has no render checkpointing (SURVEY.md §5): its
progressive state lives in the film/GL surface (count stashed in alpha,
film.cpp:61-71) plus the frame counter, and dies with the process.
Here the full progressive-render state — film accumulator, sample/frame
counters, camera, and (for inverse rendering) the optimizable scene
arrays — is an explicit pytree saved with orbax when available, with an
npz fallback.  Resuming reproduces bit-identical continuation because
sampling is a pure function of (pixel, frame, sample) (core/sampler.py).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix, out):
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def _unflatten(flat):
    tree = {}
    for key, v in flat.items():
        parts = key.split("/")
        d = tree
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = jnp.asarray(v)
    return tree


def save_checkpoint(path, state: dict):
    """Save a (nested dict) pytree of arrays/scalars.

    path: directory (orbax) or .npz file (portable fallback).
    """
    if path.endswith(".npz"):
        flat = {}
        _flatten(state, "", flat)
        np.savez_compressed(path, **flat)
        return
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    ckpt.save(os.path.abspath(path), state, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path, target=None):
    """Load a checkpoint saved by save_checkpoint."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            return _unflatten({k: z[k] for k in z.files})
    import orbax.checkpoint as ocp

    ckpt = ocp.StandardCheckpointer()
    return ckpt.restore(os.path.abspath(path), target)


def render_state(film, frame, scene=None, extra=None):
    """Assemble the canonical progressive-render checkpoint pytree."""
    st = {"film": film.state(), "frame": jnp.int32(frame)}
    if scene is not None:
        st["scene_arrays"] = dict(scene.arrays)
    if extra:
        st["extra"] = dict(extra)
    return st


def restore_render_state(st, film, scene=None):
    """Apply a loaded checkpoint; returns (frame, scene-with-arrays)."""
    film.load_state(st["film"])
    frame = int(st["frame"])
    if scene is not None and "scene_arrays" in st:
        scene = scene.replace(**st["scene_arrays"])
    return frame, scene
