"""Fused per-slot "fragment shader" — the Pallas TPU kernel that replaces the
multi-stage XLA op graph of conversion's per-slot math.

The reference's converterFS runs once per covered texel, sampling PBR
textures and writing one gaussian (reference:
src/shaders/conversion/converterFS.glsl:46-103). Round 1/2 expressed that as
~100 XLA elementwise ops over (cap,) columns; XLA materialized dozens of
(cap, 1) intermediates at T(1,128) tiling plus layout copies — ~25 ms of the
43 ms conversion. This module fuses the whole thing into two streaming Pallas
kernels around ONE XLA texture gather:

  kernel A (texel index): slot meta + the first 16 record fields ->
      the bilinear footprint's packed atlas row per slot.
  XLA: one gather from the pair-packed tap atlas (<= 196608 rows stays in
      the fast gather tier: 4.4 ms/1.55M idx vs 17 ms at >= 262144 rows —
      measured, see scripts/profile.py).
  kernel B (fragment): records + taps + meta -> all splat outputs
      (coverage, barycentric lerps, bilinear mix, TBN normal mapping).

Everything per-slot flows FIELD-MAJOR ((F, cap) arrays): Mosaic runs the
math on (1, CHUNK) lane-parallel rows, and narrow (cap, k) outputs fall out
as free (k, cap).T relabels. Blocks arrive via standard BlockSpec
pipelining — no manual DMA needed since every input is slot-aligned.

The math itself lives in `_fragment_math`, shared verbatim by the TPU
kernel, the CPU path, and the custom-VJP backward (jax.vjp over the same
function), so all three stay numerically identical.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---- record layout (field-major rows of the (REC_W, T) record table) ------
# rows 0..GEO_W-1 are the "geometry window" kernel A reads (ouv, geo, uv,
# mid, lod).
REC = {
    "au": 0, "av": 1, "bu": 2, "bv": 3, "cu": 4, "cv": 5,      # ortho-UV
    "tx0": 6, "ty0": 7, "tw": 8,                                # texel bbox
    "ua": 9, "va": 10, "ub": 11, "vb": 12, "uc": 13, "vc": 14,  # texture UV
    "mid": 15,                                                  # material id
    "lod": 16,                                                  # mip level
    "pax": 17, "pay": 18, "paz": 19, "pbx": 20, "pby": 21, "pbz": 22,
    "pcx": 23, "pcy": 24, "pcz": 25,                            # tri_pos
    "nax": 26, "nay": 27, "naz": 28, "nbx": 29, "nby": 30, "nbz": 31,
    "ncx": 32, "ncy": 33, "ncz": 34,                            # tri_normal
    "tax": 35, "tay": 36, "taz": 37, "taw": 38,
    "tbx": 39, "tby": 40, "tbz": 41, "tbw": 42,
    "tcx": 43, "tcy": 44, "tcz": 45, "tcw": 46,                 # tri_tangent
    "qw": 47, "qx": 48, "qy": 49, "qz": 50,                     # quat
    "sx": 51, "sy": 52, "sz": 53,                               # scale
    "fr": 54, "fg": 55, "fb": 56, "fa": 57,                     # color factor
}
REC_W = 64          # padded record rows (multiple of 8 sublanes)
GEO_W = 24          # kernel A's record window (rows 0..23, 8-aligned)
CHUNK = 2048        # slots per grid step
TAPS_C = 10         # channels per tap: rgba | normal xyz | mr rgb
MAX_PACK = 4        # max texels packed per atlas row
FAST_ROWS = 196608  # largest table row count in the fast gather tier

# fragment outputs, field-major: rows 0-2 pos | 3-6 color | 7-9 scale |
# 10-12 normal | 13-16 quat | 17-18 pbr | 19 valid
OUT_W = 20


def _is_tpu() -> bool:
    return jax.default_backend() in ("tpu", "axon")


def _onehot_select(win, rel, rows):
    """Exact record selection on the MXU: win (rows, W) f32 window, rel
    (1, CHUNK) int32 relative indices in [0, W) -> (rows, CHUNK) f32.

    sel = win @ onehot(rel). The one-hot operand is exact in bf16 (only
    0.0/1.0), so the 3-term f32 = bf16(hi)+bf16(mid)+bf16(lo) decomposition
    of `win` reconstructs each selected value EXACTLY (v_hi + v_mid + v_lo
    covers all 24 mantissa bits; products against {0, 1} are exact; the
    partial sums are exactly representable) — unlike generic HIGHEST
    matmuls this is bit-exact selection, at 3 DEFAULT-precision MXU passes.
    Requires win to be free of non-finite values (0 * NaN = NaN would leak
    across the one-hot zeros): conversion sanitizes records at build."""
    w = win.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (w, rel.shape[1]), 0)
    oh = (iota == rel).astype(jnp.bfloat16)
    hi = win.astype(jnp.bfloat16)
    mid = (win - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    lo = (win - hi.astype(jnp.float32) - mid.astype(jnp.float32)).astype(
        jnp.bfloat16
    )

    def dot(a):
        return jax.lax.dot_general(
            a, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    return dot(hi) + dot(mid) + dot(lo)


def pack_factor(total_texels: int) -> int:
    """Texels per atlas row so the gather table stays in the fast tier
    (row count <= FAST_ROWS), capped at MAX_PACK — beyond that the row
    bytes dominate and mip selection is the right fix."""
    k = 1
    while k < MAX_PACK and -(-total_texels // k) > FAST_ROWS:
        k *= 2
    return k


def mip_dims(h: int, w: int, mips: bool, max_levels: int = 8):
    """Static mip-chain dimensions [(h, w), ...]: exact 2x box halving
    while both sides stay even and >= 8 (the reference's glGenerateMipmap
    chain, glUtils.cpp:305, restricted to the exact-box regime)."""
    dims = [(h, w)]
    while (mips and len(dims) < max_levels
           and h % 2 == 0 and w % 2 == 0 and h >= 16 and w >= 16):
        h, w = h // 2, w // 2
        dims.append((h, w))
    return dims


def mip_geometry(h: int, w: int, k: int, mips: bool, n_layers: int = 1):
    """Static per-level atlas geometry: ((row_off, h, w, hw_pad), ...).
    hw_pad pads each level-layer to a multiple of k so packed rows never
    straddle layers; row_off is the level's first GLOBAL atlas row (each
    level block holds n_layers contiguous layers)."""
    geom = []
    off = 0
    for lh, lw in mip_dims(h, w, mips):
        hw_pad = -(-(lh * lw) // k) * k
        geom.append((off, lh, lw, hw_pad))
        off += n_layers * hw_pad // k
    return tuple(geom)


def downsample2(stack):
    """Exact 2x2 box filter per layer/channel — the standard mip reduction
    (glGenerateMipmap's default box kernel)."""
    m, h, w, c = stack.shape
    return stack.reshape(m, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def build_pair_atlas(stack: jax.Array, k: int, packed: bool = False,
                     mips: bool = False):
    """(M, H, W, C) texture stack -> transposed pair-packed tap atlas
    (4*C*k, n_rows) + the static per-level geometry (mip_geometry). Each
    row holds the 2x2 bilinear footprints of k texels (REPEAT wrap within
    the layer, reference: glUtils.cpp:252-318 GL_REPEAT). mips=True
    appends the 2x-box mip chain's levels (glGenerateMipmap parity,
    glUtils.cpp:305) — rows grow ~1.33x.

    packed=True additionally packs CHANNEL PAIRS as two bf16s per int32
    lane (field f with field f + n/2; see _unpack_taps), halving the tap
    gather's bytes. bf16 keeps 8 mantissa bits, i.e. the quantization of
    the reference's own u8 textures filtered by GL at 8-bit precision
    (glUtils.cpp uploads GL_RGBA8); int32 (not f32) lanes so the bit
    patterns survive data movement (denormal-flush hazard). Forward-only:
    bit ops cut autodiff, so the differentiable texture path
    (fit_textures) uses packed=False."""
    m, h, w, c = stack.shape
    geom = mip_geometry(h, w, k, mips, n_layers=m)

    def level_rows(lvl_stack, hw_pad):
        lm, lh, lw, lc = lvl_stack.shape
        t01 = jnp.roll(lvl_stack, -1, axis=2)
        t10 = jnp.roll(lvl_stack, -1, axis=1)
        t11 = jnp.roll(t10, -1, axis=2)
        taps = jnp.concatenate([lvl_stack, t01, t10, t11], axis=-1)
        hw = lh * lw
        flat = taps.reshape(lm, hw, 4 * lc)
        if hw_pad != hw:
            flat = jnp.pad(flat, ((0, 0), (0, hw_pad - hw), (0, 0)))
        return flat.reshape(lm * hw_pad // k, k * 4 * lc)

    rows = []
    cur = stack
    for off, lh, lw, hw_pad in geom:
        if cur.shape[1] != lh:
            cur = downsample2(cur)
        rows.append(level_rows(cur, hw_pad))
    atlasT = jnp.transpose(jnp.concatenate(rows, axis=0))  # (k*4*c, n_rows)
    if not packed:
        return atlasT, geom
    half = atlasT.shape[0] // 2
    # bf16 bits live in the upper 16 of the f32 pattern; rounding via the
    # dtype cast, then pure bit packing
    def bf16_bits(x):
        r = x.astype(jnp.bfloat16).astype(jnp.float32)
        return jax.lax.bitcast_convert_type(r, jnp.int32)

    hi = bf16_bits(atlasT[:half]) & jnp.int32(-65536)        # 0xFFFF0000
    lo = jax.lax.shift_right_logical(bf16_bits(atlasT[half:]), 16)
    return hi | lo, geom


def _unpack_taps(packed_i32):
    """Inverse of build_pair_atlas's channel packing: (n/2, N) int32 ->
    (n, N) f32. bf16 -> f32 is exactly a 16-bit left shift of the pattern,
    so both halves are two bit ops each — VPU-trivial inside the kernel."""
    hi = jax.lax.bitcast_convert_type(
        packed_i32 & jnp.int32(-65536), jnp.float32
    )
    lo = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(packed_i32, 16), jnp.float32
    )
    return jnp.concatenate([hi, lo], axis=0)


class _F:
    """Field-view over a field-major (F, N) array: f("name") -> (1, N)."""

    def __init__(self, arr, layout=None):
        self.arr = arr
        self.layout = layout or REC

    def __call__(self, name):
        i = self.layout[name]
        return self.arr[i:i + 1, :]


def _row_span_cols(au, av, bu, bv, cu, cv, tx0, tw, y, res):
    """Column-form of conversion._row_span: exact covered texel-column range
    of the row at center ordinate y. MUST stay operation-for-operation
    identical to conversion._row_span so the slot budget allocated by the
    row pass matches what the kernel enumerates."""

    def edge_x(pu_, pv_, qu_, qv_):
        den = qv_ - pv_
        span = jnp.logical_and((pv_ - y) * (qv_ - y) <= 0, jnp.abs(den) > 1e-20)
        tt_ = (y - pv_) / jnp.where(span, den, 1.0)
        xx = pu_ + tt_ * (qu_ - pu_)
        big = jnp.float32(3e38)
        return jnp.where(span, xx, big), jnp.where(span, xx, -big)

    lo0, hi0 = edge_x(au, av, bu, bv)
    lo1, hi1 = edge_x(bu, bv, cu, cv)
    lo2, hi2 = edge_x(cu, cv, au, av)
    xlo = jnp.minimum(jnp.minimum(lo0, lo1), lo2)
    xhi = jnp.maximum(jnp.maximum(hi0, hi1), hi2)

    c0 = jnp.ceil(xlo * res - 0.5 - 1e-2).astype(jnp.int32)
    c1 = jnp.floor(xhi * res - 0.5 + 1e-2).astype(jnp.int32)
    c0 = jnp.clip(c0, tx0, tx0 + tw - 1)
    return c0


def _slot_uv(rec, meta, res):
    """Per-slot texel center (pu, pv), barycentrics, coverage, and texture
    uv — the shared front half of kernels A and B.

    rec: (>=GEO_W, N) field-major record rows; meta: (4, N) f32
    [tri, row_local, local, live]. Returns a dict of (1, N) columns."""
    f = _F(rec)
    row_local = meta[1:2, :]
    local = meta[2:3, :]
    live = meta[3:4, :] > 0.0

    tx0 = f("tx0").astype(jnp.int32)
    tw = f("tw").astype(jnp.int32)
    tj = f("ty0").astype(jnp.int32) + row_local.astype(jnp.int32)
    y_s = (tj.astype(jnp.float32) + 0.5) / res

    au, av = f("au"), f("av")
    bu, bv = f("bu"), f("bv")
    cu, cv = f("cu"), f("cv")

    sc0 = _row_span_cols(au, av, bu, bv, cu, cv, tx0, tw, y_s, res)
    ti = sc0 + local.astype(jnp.int32)
    pu = (ti.astype(jnp.float32) + 0.5) / res
    pv = y_s

    # barycentrics (identical op order to conversion's column form)
    v0u, v0v = bu - au, bv - av
    v1u, v1v = cu - au, cv - av
    v2u, v2v = pu - au, pv - av
    den = v0u * v1v - v1u * v0v
    safe = jnp.where(jnp.abs(den) < 1e-20, 1.0, den)
    wb = (v2u * v1v - v1u * v2v) / safe
    wc = (v0u * v2v - v2u * v0v) / safe
    wa = 1.0 - wb - wc

    # coverage with the top-left fill rule (conversion._coverage_top_left)
    s_sign = jnp.sign(den)

    def edge_w(p0u, p0v, p1u, p1v):
        return ((p1u - p0u) * (pv - p0v) - (p1v - p0v) * (pu - p0u)) * s_sign

    def top_left(p0u, p0v, p1u, p1v):
        du = (p1u - p0u) * s_sign
        dv = (p1v - p0v) * s_sign
        return jnp.logical_or(dv < 0, jnp.logical_and(dv == 0, du < 0))

    def accept(wq, tl):
        return jnp.logical_or(wq > 0, jnp.logical_and(wq == 0, tl))

    inside = jnp.logical_and(
        jnp.logical_and(
            accept(edge_w(au, av, bu, bv), top_left(au, av, bu, bv)),
            accept(edge_w(bu, bv, cu, cv), top_left(bu, bv, cu, cv)),
        ),
        jnp.logical_and(
            accept(edge_w(cu, cv, au, av), top_left(cu, cv, au, av)),
            jnp.abs(den) > 1e-20,
        ),
    )
    valid = jnp.logical_and(live, inside)

    def lerp3(n0, n1, n2):
        return f(n0) * wa + f(n1) * wb + f(n2) * wc

    uu = lerp3("ua", "ub", "uc")
    vv = lerp3("va", "vb", "vc")
    return dict(wa=wa, wb=wb, wc=wc, uu=uu, vv=vv, valid=valid, lerp3=lerp3)


def _tap_index(uu, vv, mid, lod, geom, k):
    """Packed atlas row index + sub-slot + bilinear fractions for the 2x2
    footprint at (uu, vv) in mip level ``lod`` — the index/fraction math of
    sampling.sample_bilinear_atlas_layered, extended with nearest-mip level
    selection (the reference's implicit-LOD texture() on a mipmapped
    GL_RGBA8).

    mip_dims guarantees exact 2x halving, so the level dimensions are
    per-lane SHIFTS (h0 >> lvl) and only the level row offset and hw_pad
    need small where-chain selects — the index math itself runs once, not
    per level (~1 ms saved per conversion at 1.5M slots vs the unrolled
    form)."""
    levels = len(geom)
    if levels == 1:
        off0, lh0, lw0, hw0 = geom[0]
        lh = jnp.int32(lh0)
        lw = jnp.int32(lw0)
        off = jnp.int32(off0)
        hw_pad = jnp.int32(hw0)
    else:
        lvl = jnp.clip(lod.astype(jnp.int32), 0, levels - 1)
        lh = jnp.int32(geom[0][1]) >> lvl
        lw = jnp.int32(geom[0][2]) >> lvl
        off = jnp.int32(geom[0][0])
        hw_pad = jnp.int32(geom[0][3])
        for i in range(1, levels):
            sel = lvl == i
            off = jnp.where(sel, geom[i][0], off)
            hw_pad = jnp.where(sel, geom[i][3], hw_pad)
    lhf = lh.astype(jnp.float32)
    lwf = lw.astype(jnp.float32)
    # REPEAT-wrap the uv to [0, 1) first (identical to the old integer mod
    # for uv already in [0, 1], which is bit-exact for the test suite)
    uw = uu - jnp.floor(uu)
    vw = vv - jnp.floor(vv)
    u = uw * lwf - 0.5
    v = vw * lhf - 0.5
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = u - u0
    fv = v - v0
    # REPEAT wrap without a dynamic mod (slow on TPU): uv in [0, 1] puts
    # u0 in [-1, lw - 1], so wrapping is a single conditional add
    u0i = u0.astype(jnp.int32)
    v0i = v0.astype(jnp.int32)
    u0i = u0i + jnp.where(u0i < 0, lw, 0)
    v0i = v0i + jnp.where(v0i < 0, lh, 0)
    texel = mid.astype(jnp.int32) * hw_pad + v0i * lw + u0i
    return off + texel // k, jnp.mod(texel, k), fu, fv


def _fragment_math(rec, taps, meta, *, res, geom, k,
                   has_stack, has_base, has_normal, has_mr):
    """The whole fragment shader on field-major rows. rec (REC_W, N) f32;
    taps (k*4*TAPS_C, N) f32 | None; meta (3, N) f32. Returns (OUT_W, N).

    Transcribes conversion's per-slot math 1:1 (converterFS.glsl:46-103
    parity is documented there); shared by the Pallas kernel, the CPU path,
    and the backward pass."""
    f = _F(rec)
    s = _slot_uv(rec, meta, res)
    wa, wb, wc, lerp3 = s["wa"], s["wb"], s["wc"], s["lerp3"]

    px, py, pz = lerp3("pax", "pbx", "pcx"), lerp3("pay", "pby", "pcy"), \
        lerp3("paz", "pbz", "pcz")
    nx, ny, nz = lerp3("nax", "nbx", "ncx"), lerp3("nay", "nby", "ncy"), \
        lerp3("naz", "nbz", "ncz")
    tx_, ty_, tz_, tw_ = (
        lerp3("tax", "tbx", "tcx"), lerp3("tay", "tby", "tcy"),
        lerp3("taz", "tbz", "tcz"), lerp3("taw", "tbw", "tcw"),
    )

    s_albedo = s_normal = s_mr = None
    if has_stack:
        _, sub, fu, fv = _tap_index(
            s["uu"], s["vv"], f("mid"), f("lod"), geom, k
        )
        # select the sub-texel's 4C tap group from the packed row, then
        # bilinear-mix exactly like sampling.sample_bilinear_atlas
        group = taps[0:4 * TAPS_C, :]
        for j in range(1, k):
            group = jnp.where(
                sub == j, taps[j * 4 * TAPS_C:(j + 1) * 4 * TAPS_C, :], group
            )
        c = TAPS_C
        t00 = group[0 * c:1 * c, :]
        t01 = group[1 * c:2 * c, :]
        t10 = group[2 * c:3 * c, :]
        t11 = group[3 * c:4 * c, :]
        mix = (
            t00 * (1 - fu) * (1 - fv)
            + t01 * fu * (1 - fv)
            + t10 * (1 - fu) * fv
            + t11 * fu * fv
        )
        s_albedo = mix[0:4, :]
        s_normal = mix[4:7, :]
        s_mr = mix[7:10, :]

    # albedo x u_materialFactor (converterFS.glsl:55-62, :99); the factor
    # rides the record so packed multi-material scenes fold per-triangle
    factor = jnp.concatenate([f("fr"), f("fg"), f("fb"), f("fa")], axis=0)
    if has_base:
        color = s_albedo * factor
    else:
        color = factor

    # normal map via TBN (converterFS.glsl:68-81), columnwise
    if has_normal:
        mx = s_normal[0:1, :] * 2.0 - 1.0
        my = s_normal[1:2, :] * 2.0 - 1.0
        mz = s_normal[2:3, :] * 2.0 - 1.0
        rinv = jax.lax.rsqrt(mx * mx + my * my + mz * mz + 1e-24)
        mx, my, mz = mx * rinv, my * rinv, mz * rinv
        rinv = jax.lax.rsqrt(nx * nx + ny * ny + nz * nz + 1e-24)
        ux, uy, uz = nx * rinv, ny * rinv, nz * rinv
        bx = uy * tz_ - uz * ty_
        by = uz * tx_ - ux * tz_
        bz = ux * ty_ - uy * tx_
        rinv = jax.lax.rsqrt(bx * bx + by * by + bz * bz + 1e-24)
        bx, by, bz = bx * rinv * tw_, by * rinv * tw_, bz * rinv * tw_
        ox = tx_ * mx + bx * my + ux * mz
        oy = ty_ * mx + by * my + uy * mz
        oz = tz_ * mx + bz * my + uz * mz
        rinv = jax.lax.rsqrt(ox * ox + oy * oy + oz * oz + 1e-24)
        ox, oy, oz = ox * rinv, oy * rinv, oz * rinv
    else:
        ox, oy, oz = nx, ny, nz

    # metallic-roughness: .b = metallic, .g = roughness, defaults (0.1, 0.5)
    # when absent (converterFS.glsl:87-95)
    if has_mr:
        metal = s_mr[2:3, :]
        rough = s_mr[1:2, :]
    else:
        metal = jnp.full_like(px, 0.1)
        rough = jnp.full_like(px, 0.5)

    return jnp.concatenate(
        [
            px, py, pz,
            color,
            f("sx"), f("sy"), f("sz"),
            ox, oy, oz,
            f("qw"), f("qx"), f("qy"), f("qz"),
            metal, rough,
            s["valid"].astype(jnp.float32),
        ],
        axis=0,
    )  # (OUT_W, N)


# --------------------------------------------------------------------------
# kernel plumbing shared by kernels A and B
#
# Window path (w_rec > 0): records stay in HBM as a transposed (REC_W, T_pad)
# table; each chunk's slots reference a CONTIGUOUS triangle range (slot
# allocation is triangle-ordered), so the kernel DMAs the (REC_W, w_rec)
# window at the chunk's first triangle (scalar-prefetched) — double-buffered
# — and selects per-slot records with the exact one-hot MXU trick. This
# replaces a 2.8 ms XLA gather + 1.7 ms layout copy with ~0.3 ms of DMA +
# matmul. w_rec must bound the triangle span of any slot chunk (calibrated;
# conversion falls back to the gather path when 0).
# --------------------------------------------------------------------------

def _tri_rel(meta, bases_ref):
    base = bases_ref[pl.program_id(0)]
    return meta[0:1, :].astype(jnp.int32) - base


def _local_scan(meta, carry_ref):
    """Per-slot index within its texel-row segment, computed in-kernel — the
    TPU-fast replacement for the seg-start scatter+cummax fill (~3 ms at
    1.5M slots): segment boundaries are where (tri, row_local) changes, a
    lane-shift compare + an 11-step Hillis-Steele running max over segment
    starts, with a 3-scalar SMEM carry across the sequential grid
    [last seg start, last tri, last row_local]. Returns (1, CHUNK) f32 and
    updates the carry. Exact: same integer result as the XLA fill."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        carry_ref[0] = 0
        carry_ref[1] = -1
        carry_ref[2] = -1

    tri = meta[0:1, :].astype(jnp.int32)
    row = meta[1:2, :].astype(jnp.int32)
    n = tri.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def prev(x, carry_val):
        r = pltpu.roll(x, 1, axis=1)
        return jnp.where(lane == 0, carry_val, r)

    newseg = jnp.logical_or(
        tri != prev(tri, carry_ref[1]), row != prev(row, carry_ref[2])
    )
    gidx = i * n + lane
    run = jnp.where(newseg, gidx, -1)
    d = 1
    while d < n:
        sh = pltpu.roll(run, d, axis=1)
        run = jnp.maximum(run, jnp.where(lane >= d, sh, -1))
        d *= 2
    seg = jnp.where(run >= 0, run, carry_ref[0])
    local = gidx - seg

    carry_ref[0] = seg[0, n - 1]
    carry_ref[1] = tri[0, n - 1]
    carry_ref[2] = row[0, n - 1]
    return local.astype(jnp.float32)


def _with_local(meta, carry_ref, local_in_kernel):
    """Returns (meta with the local row filled, local row)."""
    if not local_in_kernel:
        return meta, meta[2:3, :]
    local = _local_scan(meta, carry_ref)
    meta = jnp.concatenate([meta[0:2], local, meta[3:4]], axis=0)
    return meta, local


def _window_bases(metaT):
    """Per-chunk first-triangle indices, rounded down to the 128-lane
    alignment Mosaic requires for dynamic lane-dim DMA slices (the window
    is widened by 128 to compensate — see _w_all)."""
    return (metaT[0, ::CHUNK].astype(jnp.int32) // 128) * 128


def _w_all(w_rec: int) -> int:
    """Total DMA window: the calibrated span bound plus the (up to 127)
    base-alignment shift, rounded to the 128-lane slice granularity."""
    return (-(-(w_rec + 128) // 128)) * 128


def _window_dma(records_hbm, bases_ref, scratch, sem, w_rec):
    """Double-buffered window DMA; returns this chunk's (REC_W, w_rec)."""
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, c):
        base = pl.multiple_of(bases_ref[c], 128)  # _window_bases aligns
        return pltpu.make_async_copy(
            records_hbm.at[:, pl.ds(base, w_rec)],
            scratch.at[slot],
            sem.at[slot],
        )

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    return scratch[i % 2]


def _index_math(geo, meta, *, res, geom, k):
    """(GEO_W, N) geometry rows + meta -> (1, N) int32 packed atlas row."""
    s = _slot_uv(geo, meta, res)
    row, _, _, _ = _tap_index(
        s["uu"], s["vv"], _F(geo)("mid"), _F(geo)("lod"), geom, k
    )
    # invalid slots still gather (row 0): harmless, masked later
    return jnp.where(s["valid"], row, 0)


def _gather_rec(records, metaT):
    """Fallback/CPU path: per-slot records via one XLA gather."""
    return records[:, metaT[0].astype(jnp.int32)]


def texel_rows(records, metaT, *, res, geom, k, n_rows,
               w_rec, local_in_kernel=False):
    """Kernel A: per-slot packed atlas row indices, (cap,) int32.
    records: (REC_W, T_pad) f32 transposed record table."""
    cap = metaT.shape[1]
    kw = dict(res=res, geom=geom, k=k)
    if not _is_tpu():
        idx = _index_math(_gather_rec(records, metaT)[:GEO_W], metaT, **kw)
        return jnp.clip(idx[0], 0, n_rows - 1)

    grid = -(-cap // CHUNK)
    if w_rec:
        bases = _window_bases(metaT)
        w_all = _w_all(w_rec)

        def kernel(bases_ref, records_hbm, meta_ref, out_ref, scratch, sem,
                   carry):
            win = _window_dma(records_hbm, bases_ref, scratch, sem, w_all)
            rel = _tri_rel(meta_ref[...], bases_ref)
            geo = _onehot_select(win[:GEO_W], jnp.clip(rel, 0, w_all - 1),
                                 GEO_W)
            meta, _ = _with_local(meta_ref[...], carry, local_in_kernel)
            out_ref[...] = _index_math(geo, meta, **kw)

        idx = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((4, CHUNK), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, CHUNK), lambda i, *_: (0, i),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, REC_W, w_all), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SMEM((3,), jnp.int32),
                ],
            ),
            out_shape=jax.ShapeDtypeStruct((1, grid * CHUNK), jnp.int32),
        )(bases, records, metaT)
        return jnp.clip(idx[0, :cap], 0, n_rows - 1)

    recT = _gather_rec(records, metaT)

    def kernel(geo_ref, meta_ref, out_ref, carry):
        meta, _ = _with_local(meta_ref[...], carry, local_in_kernel)
        out_ref[...] = _index_math(geo_ref[...], meta, **kw)

    idx = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((GEO_W, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, CHUNK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, grid * CHUNK), jnp.int32),
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
    )(recT, metaT)
    return jnp.clip(idx[0, :cap], 0, n_rows - 1)


# --------------------------------------------------------------------------
# kernel B: the fragment shader
# --------------------------------------------------------------------------

@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11),
)
def fragment_apply(records, tapsT, metaT, res, geom, k,
                   has_base, has_normal, has_mr, w_rec, local_in_kernel,
                   taps_packed=False):
    """Fragment shader over all slots. records (REC_W, T_pad) f32 transposed
    record table; tapsT (k*4*TAPS_C, cap) f32 (dummy (1, cap) when no
    texture stack), or (k*4*TAPS_C/2, cap) int32 bf16-pair lanes when
    taps_packed (see build_pair_atlas; unpacked in-kernel — halves the tap
    bytes both in the XLA gather and the kernel's VMEM streams); metaT
    (4, cap) f32 [tri, row_local, local, live] (the local row may be a
    placeholder when local_in_kernel — the kernel then computes it with
    _local_scan and returns it). Returns
    ((OUT_W, cap) f32 outputs, (1, cap) f32 local).

    Forward = Pallas on TPU (window-DMA records when w_rec > 0, per-slot
    gather otherwise) / plain XLA elsewhere; backward = jax.vjp of the same
    `_fragment_math`, so gradients flow to records (mesh attributes) and
    taps (-> textures via the gather's transpose). Packed taps are
    forward-only: their cotangent is float0 (prebuilt atlases are
    constants; the differentiable texture path keeps f32 taps)."""
    return _fragment_fwd_impl(
        records, tapsT, metaT, res, geom, k,
        has_base, has_normal, has_mr, w_rec, local_in_kernel, taps_packed,
    )


def _math_kwargs(res, geom, k, has_base, has_normal, has_mr):
    return dict(
        res=res, geom=geom, k=k,
        has_stack=(has_base or has_normal or has_mr),
        has_base=has_base, has_normal=has_normal, has_mr=has_mr,
    )


def _fragment_fwd_impl(records, tapsT, metaT, res, geom, k,
                       has_base, has_normal, has_mr, w_rec, local_in_kernel,
                       taps_packed=False):
    kw = _math_kwargs(res, geom, k, has_base, has_normal, has_mr)
    cap = metaT.shape[1]

    def taps_f32(t):
        if not kw["has_stack"]:
            return None
        return _unpack_taps(t) if taps_packed else t

    if not _is_tpu():
        # CPU path: conversion always supplies local in metaT
        out = _fragment_math(
            _gather_rec(records, metaT), taps_f32(tapsT), metaT, **kw,
        )
        return out, metaT[2:3, :]

    tw = tapsT.shape[0]
    grid = -(-cap // CHUNK)

    if w_rec:
        bases = _window_bases(metaT)
        w_all = _w_all(w_rec)

        def kernel(bases_ref, records_hbm, taps_ref, meta_ref, out_ref,
                   loc_ref, scratch, sem, carry):
            win = _window_dma(records_hbm, bases_ref, scratch, sem, w_all)
            rel = _tri_rel(meta_ref[...], bases_ref)
            rec = _onehot_select(win, jnp.clip(rel, 0, w_all - 1), REC_W)
            # a chunk overflowing its calibrated window drops (never with
            # calibrate()'s exact w_rec; fallback path has no bound)
            meta, local = _with_local(meta_ref[...], carry, local_in_kernel)
            ok = jnp.logical_and(rel >= 0, rel < w_all)
            meta = jnp.concatenate(
                [meta[0:3], meta[3:4] * ok.astype(jnp.float32)], axis=0
            )
            loc_ref[...] = local
            out_ref[...] = _fragment_math(
                rec, taps_f32(taps_ref[...]), meta, **kw
            )

        out, loc = pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((tw, CHUNK), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((4, CHUNK), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((OUT_W, CHUNK), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK), lambda i, *_: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((2, REC_W, w_all), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SMEM((3,), jnp.int32),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((OUT_W, grid * CHUNK), jnp.float32),
                jax.ShapeDtypeStruct((1, grid * CHUNK), jnp.float32),
            ],
        )(bases, records, tapsT, metaT)
        return out[:, :cap], loc[:, :cap]

    recT = _gather_rec(records, metaT)

    def kernel(rec_ref, taps_ref, meta_ref, out_ref, loc_ref, carry):
        meta, local = _with_local(meta_ref[...], carry, local_in_kernel)
        loc_ref[...] = local
        out_ref[...] = _fragment_math(
            rec_ref[...], taps_f32(taps_ref[...]), meta, **kw,
        )

    out, loc = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((REC_W, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tw, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((OUT_W, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((OUT_W, grid * CHUNK), jnp.float32),
            jax.ShapeDtypeStruct((1, grid * CHUNK), jnp.float32),
        ],
        scratch_shapes=[pltpu.SMEM((3,), jnp.int32)],
    )(recT, tapsT, metaT)
    return out[:, :cap], loc[:, :cap]


def _fragment_vjp_fwd(records, tapsT, metaT, res, geom, k,
                      has_base, has_normal, has_mr, w_rec, local_in_kernel,
                      taps_packed=False):
    out, loc = _fragment_fwd_impl(
        records, tapsT, metaT, res, geom, k,
        has_base, has_normal, has_mr, w_rec, local_in_kernel, taps_packed,
    )
    meta_full = jnp.concatenate([metaT[0:2], loc, metaT[3:4]], axis=0)
    return (out, loc), (records, tapsT, meta_full)


def _fragment_vjp_bwd(res, geom, k, has_base, has_normal,
                      has_mr, w_rec, local_in_kernel, taps_packed,
                      residuals, g):
    records, tapsT, metaT = residuals
    g_out, _ = g  # local output carries no gradient
    kw = _math_kwargs(res, geom, k, has_base, has_normal, has_mr)

    if taps_packed:
        # packed (int32) taps are forward-only constants: unpack outside
        # the differentiated fn, return a float0 cotangent
        import numpy as np

        taps_const = _unpack_taps(tapsT) if kw["has_stack"] else None

        def fn_r(r):
            return _fragment_math(
                _gather_rec(r, metaT), taps_const, metaT, **kw,
            )

        _, vjp = jax.vjp(fn_r, records)
        (d_rec,) = vjp(g_out)
        d_taps = np.zeros(tapsT.shape, dtype=jax.dtypes.float0)
        return d_rec, d_taps, jnp.zeros_like(metaT)

    def fn(r, t):
        return _fragment_math(
            _gather_rec(r, metaT), t if kw["has_stack"] else None,
            metaT, **kw,
        )

    _, vjp = jax.vjp(fn, records, tapsT)
    d_rec, d_taps = vjp(g_out)
    return d_rec, d_taps, jnp.zeros_like(metaT)


fragment_apply.defvjp(_fragment_vjp_fwd, _fragment_vjp_bwd)
