import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp
import numpy as np
from bench import synth_mesh
from mesh2splat_tpu.ops import segments
from mesh2splat_tpu.ops.conversion import ConversionConfig, calibrate, convert
from mesh2splat_tpu.ops.projection import project_splats
from mesh2splat_tpu.render import binning as B
from mesh2splat_tpu.types import RenderMode, SplatFormat, make_camera

def timeit(f, *a, iters=10):
    out = f(*a); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters): out = f(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3

mesh, mat = synth_mesh()
lo, hi = mesh.bbox()
cfg = calibrate(mesh, lo, hi, ConversionConfig(resolution=512, layers=6))
sp = jax.jit(lambda m: convert(m, mat, lo, hi, cfg))(mesh)
wpx, hpx = 1920, 1080
cam = make_camera(eye=[0,0,3.2], center=[0,0,0], up=[0,1,0],
                  fov_y_rad=np.pi/3, width=wpx, height=hpx)
proj = jax.jit(lambda s: project_splats(s, cam, std_dev=cfg.scale_multiplier,
    render_mode=RenderMode.ALBEDO, splat_format=SplatFormat.MESH2SPLAT))(sp)
jax.block_until_ready(proj)
pair_capacity, row_capacity = B.calibrate_pairs(proj, wpx, hpx)
print("pairs", pair_capacity, "rows", row_capacity)

def upto(stage):
    def f(proj):
        n = proj.capacity
        ty, tx = B.tiles_for(wpx, hpx)
        num_tiles = ty * tx
        res_half = jnp.asarray([wpx, hpx], jnp.float32) * 0.5
        mean_px = (proj.mean_ndc + 1.0) * res_half
        ext = jnp.abs(proj.axes_px[:, 0]) + jnp.abs(proj.axes_px[:, 1])
        x_lo = mean_px[:, 0] - ext[:, 0]; x_hi = mean_px[:, 0] + ext[:, 0]
        row_c = jnp.asarray(hpx, jnp.float32) - mean_px[:, 1]
        y_lo = row_c - ext[:, 1]; y_hi = row_c + ext[:, 1]
        tx0 = jnp.clip(jnp.floor(x_lo / B.TILE_W).astype(jnp.int32), 0, tx - 1)
        tx1 = jnp.clip(jnp.floor(x_hi / B.TILE_W).astype(jnp.int32), 0, tx - 1)
        ty0 = jnp.clip(jnp.floor(y_lo / B.TILE_H).astype(jnp.int32), 0, ty - 1)
        ty1 = jnp.clip(jnp.floor(y_hi / B.TILE_H).astype(jnp.int32), 0, ty - 1)
        on_screen = (x_hi >= 0) & (x_lo < wpx) & (y_hi >= 0) & (y_lo < hpx)
        valid = proj.valid & on_screen
        span_x = tx1 - tx0 + 1; span_y = ty1 - ty0 + 1
        order = jnp.argsort(jnp.where(valid, proj.depth, jnp.inf), stable=True)
        rank = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
        if stage == "rank": return rank
        trow_cap = row_capacity
        n_trows = jnp.where(valid, span_y, 0)
        trow_off, trow_total = segments.alloc_slots(n_trows, trow_cap)
        trow_local, _, trow_splat = segments.expand_monotone(
            trow_off, n_trows, trow_cap, value=jnp.arange(n, dtype=jnp.int32))
        trow_splat = jnp.maximum(trow_splat, 0)
        trow_live = jnp.arange(trow_cap, dtype=jnp.int32) < trow_total
        rowtab = jnp.stack([tx0, span_x, ty0, rank], axis=1)
        rt = jax.lax.optimization_barrier(rowtab[trow_splat])
        r_tx0 = rt[:, 0]
        r_span = jnp.where(trow_live, rt[:, 1], 0)
        r_tile_y = rt[:, 2] + trow_local
        r_rank = rt[:, 3]
        if stage == "lvl1": return r_tx0.sum() + r_span.sum() + r_tile_y.sum() + r_rank.sum()
        offsets, total = segments.alloc_slots(r_span, pair_capacity)
        local, _, pair_row = segments.expand_monotone(
            offsets, r_span, pair_capacity, value=jnp.arange(trow_cap, dtype=jnp.int32))
        pair_row = jnp.maximum(pair_row, 0)
        in_budget = jnp.arange(pair_capacity, dtype=jnp.int32) < total
        ptab = jnp.stack([r_tx0, r_tile_y, r_rank, trow_splat], axis=1)
        pt = jax.lax.optimization_barrier(ptab[pair_row])
        tile_x = pt[:, 0] + local
        tile_id = jnp.where(in_budget, pt[:, 1] * tx + tile_x, num_tiles)
        pair_rank = jnp.where(in_budget, pt[:, 2], n)
        owner = pt[:, 3]
        if stage == "lvl2": return tile_id.sum() + pair_rank.sum() + owner.sum()
        rank_bits = max((n - 1).bit_length(), 1)
        key = tile_id * (1 << rank_bits) + jnp.minimum(pair_rank, n)
        key_sorted, splat_sorted = jax.lax.sort((key, owner), num_keys=1)
        tile_sorted = key_sorted >> rank_bits
        if stage == "sort": return tile_sorted.sum() + splat_sorted.sum()
        contiguous_starts = segments.segment_starts(tile_sorted, num_tiles)
        counts = contiguous_starts[1:] - contiguous_starts[:-1]
        padded_counts = ((counts + B.CHUNK - 1) // B.CHUNK) * B.CHUNK
        padded_capacity = pair_capacity + num_tiles * B.CHUNK
        padded_offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_counts).astype(jnp.int32)])
        pair_live = tile_sorted < num_tiles
        shift = padded_offsets[:num_tiles] - contiguous_starts[:num_tiles]
        dest = jnp.where(pair_live,
            shift[jnp.minimum(tile_sorted, num_tiles - 1)]
            + jnp.arange(pair_capacity, dtype=jnp.int32), padded_capacity)
        sp_padded = (jnp.full((padded_capacity,), -1, jnp.int32)
            .at[dest].set(splat_sorted, mode="drop"))
        live = sp_padded >= 0
        sp_idx = jnp.maximum(sp_padded, 0)
        if stage == "relayout": return sp_idx.sum() + live.sum()
        record = jnp.concatenate([mean_px, proj.conic, proj.color, proj.normal,
            proj.wspos, proj.depth[:, None], proj.pbr, proj.axes_px.reshape(n, 4),
            jnp.ones((n, 1), jnp.float32), jnp.zeros((n, 1), jnp.float32)], -1)
        stacked = jax.lax.optimization_barrier(record[sp_idx])
        stacked = jnp.where(live[:, None], stacked, 0.0)
        pair_data = jnp.pad(stacked, ((0, 0), (0, B.PAIR_WIDTH - B.NUM_FIELDS)))
        return pair_data
    return jax.jit(f)

for s in ("rank", "lvl1", "lvl2", "sort", "relayout", "full"):
    print(f"{s:9s}: {timeit(upto(s), proj):8.2f} ms")
