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


def pad_to_multiple(a, m, axis=0):
    pad = (-a.shape[axis]) % m
    if pad == 0:
        return a
    widths = [(0, 0)] * a.ndim
    widths[axis] = (0, pad)
    return jnp.pad(a, widths)


def shard_triangles(mesh_geom: TriangleMesh, mesh: Mesh, axis: str = "dp") -> TriangleMesh:
    """Pad + shard the triangle soup across devices (conversion input)."""
    n = mesh.shape[axis]
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(
        lambda a: jax.device_put(pad_to_multiple(a, n), sharding), mesh_geom
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
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def shard_batch(tree, mesh: Mesh, axis: str = "dp"):
    """Shard leading (batch) dim across devices."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
