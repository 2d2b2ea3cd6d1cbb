import sys, time, dataclasses
import jax, jax.numpy as jnp
sys.path.insert(0, ".")
from bench import synth_mesh
from mesh2splat_tpu.ops import segments
from mesh2splat_tpu.ops.conversion import (
    ConversionConfig, calibrate, convert, _triangle_texel_bbox, _row_span,
    _barycentric, _coverage_top_left, _fused_texture_stack)
from mesh2splat_tpu.ops.sampling import build_tap_atlas, sample_bilinear_atlas
from mesh2splat_tpu.ops.triplanar import triangle_conversion_attrs

def timeit(f, *args, iters=15):
    out = f(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
res, cap, row_cap = cfg.resolution, cfg.capacity, cfg.row_capacity
print("cap", cap, "row_cap", row_cap)

def upto(stage):
    def f(tri_pos):
        t = tri_pos.shape[0]
        attrs = triangle_conversion_attrs(tri_pos, lo, hi)
        ouv = attrs["ortho_uv"]
        x0, y0, w, h = _triangle_texel_bbox(ouv, res)
        finite = jnp.all(jnp.isfinite(tri_pos.reshape(t, -1)), axis=-1)
        n_rows = jnp.where(jnp.logical_and(finite, w > 0), h, 0)
        row_off, row_total = segments.alloc_slots(n_rows, row_cap)
        row_local, _, row_tri = segments.expand_monotone(
            row_off, n_rows, row_cap, value=jnp.arange(t, dtype=jnp.int32))
        row_live = jnp.arange(row_cap, dtype=jnp.int32) < row_total
        row_tri = jnp.maximum(row_tri, 0)
        geo = jnp.concatenate([ouv.reshape(t, 6),
            x0[:, None].astype(jnp.float32), y0[:, None].astype(jnp.float32),
            w[:, None].astype(jnp.float32)], -1)
        g = geo[row_tri]
        tx0 = g[:, 6].astype(jnp.int32); tw = g[:, 8].astype(jnp.int32)
        jr = g[:, 7].astype(jnp.int32) + row_local
        yr = (jr.astype(jnp.float32) + 0.5) / res
        c0, c1, nonempty = _row_span(g[:, 0:6], tx0, tw, yr, res)
        width = jnp.maximum(jnp.where(jnp.logical_and(row_live, nonempty), c1 - c0 + 1, 0), 0)
        if stage == "rows": return width.sum()
        offsets, total = segments.alloc_slots(width, cap)
        local, _, packed = segments.expand_monotone(
            offsets, width, cap, value=row_tri * 4096 + row_local)
        packed = jnp.maximum(packed, 0)
        tri_id = packed >> 12; srl = packed & 4095
        if stage == "expand2": return local.sum(), tri_id.sum()
        record = jnp.concatenate([tri_pos.reshape(t, 9),
            mesh.tri_normal.reshape(t, 9), mesh.tri_tangent.reshape(t, 12),
            mesh.tri_uv.reshape(t, 6), ouv.reshape(t, 6), attrs["quat"],
            attrs["scale"], geo[:, 6:9]], -1)
        rec = record[tri_id]
        if stage == "gather": return rec.sum()
        s_tx0 = rec[:, 49].astype(jnp.int32); s_tw = rec[:, 51].astype(jnp.int32)
        tj = rec[:, 50].astype(jnp.int32) + srl
        y_s = (tj.astype(jnp.float32) + 0.5) / res
        sc0, _, _ = _row_span(rec[:, 36:42], s_tx0, s_tw, y_s, res)
        ti = sc0 + local
        uv_c = (jnp.stack([ti, tj], -1).astype(jnp.float32) + 0.5) / res
        t_ouv = rec[:, 36:42].reshape(cap, 3, 2)
        bary, _ = _barycentric(uv_c, t_ouv[:, 0], t_ouv[:, 1], t_ouv[:, 2])
        inside = _coverage_top_left(uv_c, t_ouv[:, 0], t_ouv[:, 1], t_ouv[:, 2])
        if stage == "coords": return bary.sum(), inside.sum()
        b = bary[..., None]
        pos = jnp.sum(rec[:, 0:9].reshape(cap, 3, 3) * b, 1)
        nrm = jnp.sum(rec[:, 9:18].reshape(cap, 3, 3) * b, 1)
        tan = jnp.sum(rec[:, 18:30].reshape(cap, 3, 4) * b, 1)
        uv = jnp.sum(rec[:, 30:36].reshape(cap, 3, 2) * b, 1)
        if stage == "interp": return pos.sum() + nrm.sum() + tan.sum() + uv.sum()
        stack = _fused_texture_stack(mat)
        hh, ww, cc = stack.shape
        taps = sample_bilinear_atlas(build_tap_atlas(stack), hh, ww, cc, uv)
        if stage == "tex": return taps.sum()
        return None
    return jax.jit(f)

for s in ("rows", "expand2", "gather", "coords", "interp", "tex"):
    print(f"{s:8s}: {timeit(upto(s), mesh.tri_pos):7.2f} ms")
full = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))
print(f"{'full':8s}: {timeit(full, mesh):7.2f} ms")
