"""Multi-chip / multi-host data parallelism over image tiles.

The reference is single-node single-GPU (SURVEY.md §2.12); this module
is the NEW capability the TPU build adds: shard the pixel/ray axis over
a `jax.sharding.Mesh` with `shard_map`, replicate the scene + BVH per
device (mirroring idaten's one-shot UpdateSceneData upload), reduce
films and parameter gradients with `psum/pmean` over ICI.  Seeding uses
global pixel ids, so an N-chip render is bitwise identical to 1-chip.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.6 moved shard_map to the top level
    from jax import shard_map as _shard_map

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_legacy

    def shard_map(f, mesh, in_specs, out_specs):
        return _shard_map_legacy(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs)

from aten_tpu.integrator.pathtracer import _trace_paths

TILE_AXIS = "tiles"
HOST_AXES = ("hosts", "chips")


def make_mesh(n_devices=None, axis=TILE_AXIS):
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available"
            )
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def distributed_init(coordinator, num_processes, process_id,
                     local_device_count=None):
    """Join a multi-process (multi-host) JAX cluster.

    On real pods each host calls this once before any backend use
    (coordinator = host0's DCN address); tests emulate N hosts with N
    CPU processes x `local_device_count` virtual CPU devices each.
    The reference has no distribution at all (SURVEY.md §2.12) — this
    is the NEW capability layer of the TPU build.
    """
    if local_device_count is not None:
        jax.config.update("jax_num_cpu_devices", local_device_count)
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_global_mesh(axes=HOST_AXES):
    """(hosts, chips) mesh over every device in the cluster.

    Rows = processes (DCN boundary), columns = that host's chips (ICI),
    so collectives reduced over `chips` ride ICI and only the final
    cross-host combine crosses DCN.  Single-process: (1, n_local).
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = jax.process_count()
    local = len(devs) // n
    return Mesh(np.array(devs).reshape(n, local), axes)


def _mesh_axes(mesh, axis):
    """Normalize `axis` (str or tuple) to a tuple present in the mesh."""
    return (axis,) if isinstance(axis, str) else tuple(axis)


def _flat_device_index(mesh, axes):
    """Flat tile index of this device across the (possibly multi-axis)
    tile dimension — row-major over `axes`."""
    idx = jax.lax.axis_index(axes[0])
    for a in axes[1:]:
        idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
    return idx


def replicate_global(mesh, tree):
    """Make process-local arrays usable as REPLICATED inputs to a global
    (multi-process) shard_map — the analogue of idaten's one-shot
    UpdateSceneData upload, broadcast to every host's chips."""
    if jax.process_count() == 1:
        return tree
    from jax.sharding import NamedSharding

    sh = NamedSharding(mesh, P())

    def conv(x):
        if isinstance(x, (int, float, bool)) or x is None:
            return x
        arr = np.asarray(x)
        return jax.make_array_from_process_local_data(sh, arr, arr.shape)

    return jax.tree.map(conv, tree)


def shard_rows_global(mesh, axis, x):
    """Turn per-process row blocks into one global row-sharded array."""
    if jax.process_count() == 1:
        return x
    from jax.sharding import NamedSharding

    axes = _mesh_axes(mesh, axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    local = np.asarray(x)
    global_shape = (local.shape[0] * jax.process_count(),) + local.shape[1:]
    sh = NamedSharding(mesh, P(axes if len(axes) > 1 else axes[0]))
    return jax.make_array_from_process_local_data(sh, local, global_shape)


def render_tiled(
    scene, cam_arrays, width, height, frame, sample, spp=1, max_depth=5,
    rr_depth=3, mesh=None, axis=TILE_AXIS,
):
    """Render one sample with rows sharded across the mesh (single- or
    multi-axis: pass axis=("hosts","chips") with a make_global_mesh()).
    Returns [H,W,3] row-sharded (flat tile d owns rows [d*H/n, ...)).
    Seeding uses GLOBAL pixel ids, so any mesh shape is bitwise
    identical to the single-chip render."""
    if mesh is None:
        mesh = make_mesh()
    axes = _mesh_axes(mesh, axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    assert height % n == 0, f"height {height} must divide mesh size {n}"
    tile_h = height // n

    def tile_fn(scene, cam_arrays, frame, sample):
        d = _flat_device_index(mesh, axes)
        y0 = (d * tile_h).astype(jnp.int32)
        rad = _trace_paths(
            scene, cam_arrays, width, height, frame, sample, spp, max_depth,
            rr_depth, y0=y0, tile_h=tile_h,
        )
        return rad.reshape(tile_h, width, 3)

    out_spec = P(axes if len(axes) > 1 else axes[0])
    f = shard_map(
        tile_fn, mesh=mesh, in_specs=(P(), P(), P(), P()), out_specs=out_spec
    )
    return f(scene, cam_arrays, frame, sample)


# Parameters exposed to gradient-based optimization by default.  Each
# entry is "<group>.<field>" over the scene pytree: material-table
# fields, light-table fields (le / pos), or the texture atlas
# ("textures.tex_stack") — the three north-star parameter classes
# (BASELINE.md).  Bare names mean materials.<name>.  Fields absent from
# a scene (no textures / no lights) are skipped at step-build time.
TRAINABLE_FIELDS = ("base_color", "textures.tex_stack", "lights.le")


def _has_param(scene, spec):
    group, _, field = spec.partition(".")
    if not field:
        group, field = "materials", group
    if group == "textures":
        return field in scene
    return group in scene and field in scene[group]


def _get_param(scene, spec):
    group, _, field = spec.partition(".")
    if not field:
        group, field = "materials", group
    if group == "textures":
        return scene[field]
    return scene[group][field]


def _set_params(scene, params):
    repl = {}
    groups = {}
    for spec, v in params.items():
        group, _, field = spec.partition(".")
        if not field:
            group, field = "materials", group
        if group == "textures":
            repl[field] = v
        else:
            groups.setdefault(group, dict(scene[group]))[field] = v
    repl.update(groups)
    return scene.replace(**repl)


def make_train_step(
    width, height, spp=1, max_depth=3, rr_depth=2, mesh=None, axis=TILE_AXIS,
    lr=0.05, fields=TRAINABLE_FIELDS,
):
    """Build a jitted SPMD training step: differentiable render of the
    device's tile -> L2 loss vs target -> grads w.r.t. material-table
    fields -> pmean over ICI -> SGD update.  This is the flagship
    'training step' of the framework (inverse rendering), the analogue of
    a model's fwd+bwd+allreduce+update.
    """
    if mesh is None:
        mesh = make_mesh()
    axes = _mesh_axes(mesh, axis)
    n = 1
    for a in axes:
        n *= mesh.shape[a]
    assert height % n == 0
    tile_h = height // n
    fields = tuple(fields)  # resolved per scene in tile_step via _has_param

    def loss_fn(params, scene, cam_arrays, target_tile, y0, frame):
        scene2 = _set_params(scene, params)
        rad = _trace_paths(
            scene2, cam_arrays, width, height, frame, jnp.uint32(0), spp,
            max_depth, rr_depth, y0=y0, tile_h=tile_h,
        )
        img = rad.reshape(tile_h, width, 3)
        return jnp.mean((img - target_tile) ** 2)

    def tile_step(scene, cam_arrays, target_tile, frame):
        d = _flat_device_index(mesh, axes)
        y0 = (d * tile_h).astype(jnp.int32)
        live = [k for k in fields if _has_param(scene, k)]
        mat_params = {k: _get_param(scene, k) for k in live}
        loss, g = jax.value_and_grad(loss_fn)(
            mat_params, scene, cam_arrays, target_tile, y0, frame
        )
        # gradient all-reduce: `chips` legs ride ICI within a host, the
        # `hosts` leg is the only DCN hop (axes order is XLA's to fuse)
        loss = jax.lax.pmean(loss, axes)
        g = jax.tree.map(lambda x: jax.lax.pmean(x, axes), g)
        return loss, g

    tile_spec = P(axes if len(axes) > 1 else axes[0])
    smapped = shard_map(
        tile_step, mesh=mesh, in_specs=(P(), P(), tile_spec, P()),
        out_specs=(P(), P()),
    )

    @jax.jit
    def step(scene, cam_arrays, target, frame):
        loss, g = smapped(scene, cam_arrays, target, frame)
        new = {}
        for k in [k for k in fields if _has_param(scene, k)]:
            # RMS-normalized update: parameter scales differ by orders of
            # magnitude (wall albedo ~0.7 vs emitter radiance ~36), so raw
            # SGD with one lr collapses the scene; normalized steps move
            # every field at a bounded per-element rate.
            gk = g[k]
            rms = jnp.sqrt(jnp.mean(gk * gk) + 1e-12)
            new[k] = _get_param(scene, k) - lr * gk / rms
            if k.endswith("base_color") or k == "base_color" or \
                    k == "textures.tex_stack":
                new[k] = jnp.clip(new[k], 0.0, None)
        return loss, _set_params(scene, new)

    return step
