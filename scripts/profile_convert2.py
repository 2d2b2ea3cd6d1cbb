import sys, time
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from bench import synth_mesh
from mesh2splat_tpu.ops import segments
from mesh2splat_tpu.ops.conversion import (
    ConversionConfig, _triangle_texel_bbox, _barycentric, _coverage_top_left,
    _fused_texture_stack, convert)
from mesh2splat_tpu.ops.sampling import build_tap_atlas, sample_bilinear_atlas
from mesh2splat_tpu.ops.triplanar import triangle_conversion_attrs

def timeit(f, *args, iters=20):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = ConversionConfig(resolution=512, layers=4)
res, cap = cfg.resolution, cfg.capacity

def upto(stage):
    def f(tri_pos):
        t = tri_pos.shape[0]
        attrs = triangle_conversion_attrs(tri_pos, lo, hi)
        ouv = attrs["ortho_uv"]
        x0, y0, w, h = _triangle_texel_bbox(ouv, res)
        area = w * h
        if stage == "attrs": return ouv, x0, area
        offsets, total = segments.alloc_slots(area, cap)
        tri_id, local, in_budget = segments.expand_to_slots(offsets, area, cap)
        if stage == "expand": return tri_id, local
        record = jnp.concatenate([
            tri_pos.reshape(t, 9), mesh.tri_normal.reshape(t, 9),
            mesh.tri_tangent.reshape(t, 12), mesh.tri_uv.reshape(t, 6),
            ouv.reshape(t, 6), attrs["quat"], attrs["scale"],
            x0[:, None].astype(jnp.float32), y0[:, None].astype(jnp.float32),
            jnp.maximum(w, 1)[:, None].astype(jnp.float32)], -1)
        rec = record[tri_id]
        if stage == "gather": return rec.sum()
        t_ouv = rec[:, 36:42].reshape(cap, 3, 2)
        tx0 = rec[:, 49].astype(jnp.int32); ty0 = rec[:, 50].astype(jnp.int32)
        tw = rec[:, 51].astype(jnp.int32)
        ti = tx0 + local % tw; tj = ty0 + local // tw
        uv_c = (jnp.stack([ti, tj], -1).astype(jnp.float32) + 0.5) / res
        bary, _ = _barycentric(uv_c, t_ouv[:, 0], t_ouv[:, 1], t_ouv[:, 2])
        inside = _coverage_top_left(uv_c, t_ouv[:, 0], t_ouv[:, 1], t_ouv[:, 2])
        b = bary[..., None]
        tuv = rec[:, 30:36].reshape(cap, 3, 2)
        uv = jnp.sum(tuv * b, 1)
        if stage == "bary": return uv.sum(), inside.sum()
        stack = _fused_texture_stack(mat)
        hh, ww, cc = stack.shape
        taps = sample_bilinear_atlas(build_tap_atlas(stack), hh, ww, cc, uv)
        if stage == "tex": return taps.sum()
        return None
    return jax.jit(f)

full = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))
for s in ("attrs", "expand", "gather", "bary", "tex"):
    print(f"{s:8s}: {timeit(upto(s), mesh.tri_pos):7.2f} ms")
print(f"{'full':8s}: {timeit(full, mesh):7.2f} ms")
