"""Stage-ablation profile of the conversion path on the real device."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from bench import synth_mesh
from mesh2splat_tpu.ops import segments
from mesh2splat_tpu.ops.conversion import (
    ConversionConfig, _triangle_texel_bbox, _barycentric, _coverage_top_left,
    _sample, convert,
)
from mesh2splat_tpu.ops.triplanar import triangle_conversion_attrs


def timeit(f, *args, iters=20):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = ConversionConfig(resolution=512, layers=4)
res, cap = cfg.resolution, cfg.capacity


@jax.jit
def stage_a(tri_pos):
    attrs = triangle_conversion_attrs(tri_pos, lo, hi)
    ouv = attrs["ortho_uv"]
    x0, y0, w, h = _triangle_texel_bbox(ouv, res)
    return ouv, attrs["quat"], attrs["scale"], x0, y0, w, h


@jax.jit
def stage_b(tri_pos):
    """+ alloc + expand"""
    attrs = triangle_conversion_attrs(tri_pos, lo, hi)
    ouv = attrs["ortho_uv"]
    x0, y0, w, h = _triangle_texel_bbox(ouv, res)
    area = w * h
    offsets, total = segments.alloc_slots(area, cap)
    tri_id, local, in_budget = segments.expand_to_slots(offsets, area, cap)
    return tri_id, local, in_budget


@jax.jit
def stage_c(tri_pos):
    """+ the record gather"""
    t = tri_pos.shape[0]
    attrs = triangle_conversion_attrs(tri_pos, lo, hi)
    ouv = attrs["ortho_uv"]
    x0, y0, w, h = _triangle_texel_bbox(ouv, res)
    area = w * h
    offsets, total = segments.alloc_slots(area, cap)
    tri_id, local, in_budget = segments.expand_to_slots(offsets, area, cap)
    record = jnp.concatenate(
        [tri_pos.reshape(t, 9), ouv.reshape(t, 6), attrs["quat"],
         attrs["scale"], x0[:, None].astype(jnp.float32),
         y0[:, None].astype(jnp.float32),
         jnp.maximum(w, 1)[:, None].astype(jnp.float32)], axis=-1)
    rec = record[tri_id]
    return rec.sum()


@jax.jit
def stage_d(tri_pos):
    """gather-only at cap rows, 52 cols"""
    t = tri_pos.shape[0]
    record = jnp.tile(tri_pos.reshape(t, 9), (1, 6))[:, :52]
    idx = jnp.mod(jnp.arange(cap, dtype=jnp.int32) * 7, t)
    return record[idx].sum()


@jax.jit
def stage_tex(uv):
    """one tap-atlas texture sample at cap rows"""
    return _sample(mat.base_color, uv).sum()


full = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))

uv = jnp.mod(jnp.arange(cap, dtype=jnp.float32)[:, None] * jnp.asarray([[0.001, 0.0007]]), 1.0)

print(f"A  per-tri attrs:        {timeit(stage_a, mesh.tri_pos):7.2f} ms")
print(f"B  + alloc/expand:       {timeit(stage_b, mesh.tri_pos):7.2f} ms")
print(f"C  + record gather:      {timeit(stage_c, mesh.tri_pos):7.2f} ms")
print(f"D  bare 1M-row gather:   {timeit(stage_d, mesh.tri_pos):7.2f} ms")
print(f"T  one texture sample:   {timeit(stage_tex, uv):7.2f} ms")
print(f"F  full convert:         {timeit(full, mesh):7.2f} ms")
