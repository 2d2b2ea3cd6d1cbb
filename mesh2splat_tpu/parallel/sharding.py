"""Multi-chip sharding layer: jax.sharding.Mesh + shard_map partitioning.

The reference has no distributed execution at all (SURVEY.md section 2.5);
this module is new capability required by the BASELINE north star: texels/
triangles sharded for conversion, image tiles/cameras for rendering, and
gradient psum over splat/texture parameters overlapped with the backward pass
(XLA schedules the psum concurrently with remaining backward compute).

Axes:
  dp — data parallel over cameras/views (training) or batch items
  sp — "splat/spatial parallel" over triangles (conversion) or splats
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import Material, Splats, TriangleMesh
from ..ops.conversion import ConversionConfig, convert


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.asarray(devs[:n]), (axis,))


def init_distributed(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
    platform: str | None = None,
) -> None:
    """Join a multi-HOST (multi-process) JAX runtime. After this,
    jax.devices() spans every process and Mesh/shard_map programs run DCN/
    ICI collectives across hosts — the missing piece the reference (single-
    process, single-GPU) never had (SURVEY.md section 2.5).

    On TPU pods, coordinator_address/num_processes/process_id usually come
    from the environment and may be omitted upstream; this wrapper keeps the
    explicit form so CPU multi-process tests (gloo collectives) and real pod
    slices share one code path.
    """
    if platform == "cpu":
        # Gloo is the cross-process collectives implementation for XLA:CPU;
        # TPU slices use ICI/DCN natively and ignore this setting.
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_shape: tuple[int, ...] | None = None,
                axis_names: tuple[str, ...] = ("dp",)) -> Mesh:
    """Mesh over ALL processes' devices (call after init_distributed).
    axis_shape defaults to 1-D over every global device."""
    devs = np.asarray(jax.devices())
    if axis_shape is None:
        axis_shape = (len(devs),)
    return Mesh(devs.reshape(axis_shape), axis_names)


def put_global(tree, mesh: Mesh, spec):
    """device_put that works on multi-process meshes: every process passes
    the SAME full (host/numpy) value; each fills only its addressable
    shards. On a single-process mesh this is equivalent to device_put."""
    def put(a):
        a = np.asarray(a)
        sharding = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(a.shape, sharding,
                                            lambda idx: a[idx])

    return jax.tree.map(put, tree)


def pad_to_multiple(a, m, axis=0):
    pad = (-a.shape[axis]) % m
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def _spans_processes(mesh: Mesh) -> bool:
    pi = jax.process_index()
    return any(d.process_index != pi for d in mesh.devices.flat)


def _put(tree, mesh: Mesh, spec):
    if _spans_processes(mesh):
        return put_global(tree, mesh, spec)
    sharding = NamedSharding(mesh, spec)
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def shard_triangles(mesh_geom: TriangleMesh, mesh: Mesh, axis: str = "dp") -> TriangleMesh:
    """Pad + shard the triangle soup across devices (conversion input)."""
    n = mesh.shape[axis]
    return _put(
        jax.tree.map(lambda a: pad_to_multiple(a, n), mesh_geom), mesh, P(axis)
    )


def convert_sharded(
    mesh_geom: TriangleMesh,
    material: Material,
    bbox_min,
    bbox_max,
    config: ConversionConfig,
    mesh: Mesh,
    axis: str = "dp",
) -> Splats:
    """Conversion sharded over triangles: each device converts its triangle
    shard against the full (replicated) textures; the output stays sharded
    over the splat dimension (capacity = config.capacity per device).

    This is the sharded equivalent of the reference's per-mesh conversion
    draw (ConversionPass.cpp:50-52) — no communication at all in the forward;
    the backward all-reduces texture gradients automatically (psum inserted
    by shard_map's reverse-mode transpose of the replicated-material use).
    """
    geom = shard_triangles(mesh_geom, mesh, axis)
    repl = P()

    def local_convert(tri_pos, tri_normal, tri_tangent, tri_uv, mat, lo, hi):
        local = TriangleMesh(
            tri_pos=tri_pos, tri_normal=tri_normal,
            tri_tangent=tri_tangent, tri_uv=tri_uv,
        )
        sp = convert(local, mat, lo, hi, config)
        return sp

    f = jax.shard_map(
        local_convert,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), repl, repl, repl),
        out_specs=jax.tree.map(lambda _: P(axis), Splats.zeros(1)),
        check_vma=False,
    )
    return f(
        geom.tri_pos, geom.tri_normal, geom.tri_tangent, geom.tri_uv,
        material, jnp.asarray(bbox_min), jnp.asarray(bbox_max),
    )


def replicate(tree, mesh: Mesh):
    return _put(tree, mesh, P())


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard leading (batch) dim across devices."""
    return _put(tree, mesh, P(axis))


def rasterize_sharded(
    proj,
    width: int,
    height: int,
    mesh: Mesh,
    axis: str = "dp",
    pair_capacity: int = 0,
    albedo_only: bool = False,
):
    """Rasterize with image tiles sharded across devices: each device owns a
    horizontal band of tile rows (SURVEY.md section 2.5 — image-tile
    sharding). Splats are replicated; there is NO communication in the
    forward pass, and the backward all-reduces per-splat gradients
    automatically (shard_map transposes the replicated use into a psum).

    height must divide evenly into n_devices * TILE_H bands. Returns the
    full (height, width, 4) premultiplied albedo image, row-sharded.
    """
    from ..ops.projection import ProjectedSplats
    from ..render.binning import TILE_H
    from ..render.tiled import rasterize_tiled

    n = mesh.shape[axis]
    band_h = height // n
    if band_h * n != height or band_h % TILE_H != 0:
        raise ValueError(
            f"height {height} must be divisible by n_devices*TILE_H "
            f"({n}*{TILE_H})"
        )

    proj = replicate(proj, mesh)

    def band(proj_local):
        idx = jax.lax.axis_index(axis)
        y0 = (idx * band_h).astype(jnp.float32)
        # shift the projection so this band maps to local rows [0, band_h):
        # local_row = global_row - y0 with global_row = height - mean_px_y
        mean_px_y = (proj_local.mean_ndc[:, 1] + 1.0) * (height * 0.5)
        mean_px_y_local = mean_px_y - (height - y0 - band_h)
        mean_ndc_y = mean_px_y_local / (band_h * 0.5) - 1.0
        shifted = ProjectedSplats(
            mean_ndc=jnp.stack([proj_local.mean_ndc[:, 0], mean_ndc_y], -1),
            axes_px=proj_local.axes_px,
            conic=proj_local.conic,
            depth=proj_local.depth,
            color=proj_local.color,
            normal=proj_local.normal,
            wspos=proj_local.wspos,
            pbr=proj_local.pbr,
            valid=proj_local.valid,
        )
        out = rasterize_tiled(
            shifted, width, band_h, pair_capacity=pair_capacity,
            albedo_only=albedo_only,
        )
        return out["albedo"]

    f = jax.shard_map(
        band, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), proj),),
        out_specs=P(axis),
        check_vma=False,
    )
    return f(proj)
