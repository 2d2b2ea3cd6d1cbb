"""Omnidirectional (cubemap) splat shadows + PCF sampling.

Replaces the reference's GaussianShadowPass (reference:
src/renderer/renderPasses/GaussianShadowPass.cpp:83-236 and
gaussianPointShadowMappingCS/ShadowVS/ShadowPS.glsl): each splat is binned to
the cubemap face of its dominant light-space direction (G9:58-69), its quad
is projected with the same EWA math against that face's 90-degree camera, and
the face depth map stores the MIN radial distance |ws - light| / far over
covering quads (ShadowPS.glsl:17 + hardware depth test).

Min-compositing needs no depth sort and no alpha — order-independent — so the
TPU formulation is a chunked scan with a running per-pixel minimum.

PCF: the 20-tap disk kernel of the deferred shader
(gaussianSplattingDeferredPS.glsl:70-99), bias 0.05, disk radius 0.025.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..types import Camera, Splats, look_at, perspective
from ..ops.projection import ProjectedSplats, project_splats
from ..types import SplatFormat

# GL cubemap face order: +X, -X, +Y, -Y, +Z, -Z
_FACE_DIRS = np.array(
    [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
    np.float32,
)
_FACE_UPS = np.array(
    [[0, -1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1], [0, -1, 0], [0, -1, 0]],
    np.float32,
)

# reference PCF taps (deferredPS:72-79)
_PCF_OFFSETS = np.array(
    [
        [1, 1, 1], [1, -1, 1], [-1, -1, 1], [-1, 1, 1],
        [1, 1, -1], [1, -1, -1], [-1, -1, -1], [-1, 1, -1],
        [1, 1, 0], [1, -1, 0], [-1, -1, 0], [-1, 1, 0],
        [1, 0, 1], [-1, 0, 1], [1, 0, -1], [-1, 0, -1],
        [0, 1, 1], [0, -1, 1], [0, -1, -1], [0, 1, -1],
    ],
    np.float32,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class ShadowCubemap:
    """6 x (S, S) min radial-distance maps, values in [0, 1] (x far)."""

    faces: jax.Array      # (6, S, S) f32
    light_pos: jax.Array  # (3,)
    far: jax.Array        # scalar

    @property
    def resolution(self):
        return self.faces.shape[1]


def face_cameras(light_pos, far, size: int, near: float = 0.1):
    """Traceable: rotation blocks are constants per face; only the
    translation column depends on the (possibly traced) light position."""
    light_pos = jnp.asarray(light_pos, jnp.float32)
    cams = []
    for i in range(6):
        rot = look_at(np.zeros(3), _FACE_DIRS[i], _FACE_UPS[i])  # constant
        m = jnp.asarray(rot).at[:3, 3].set(-jnp.asarray(rot[:3, :3]) @ light_pos)
        cams.append(
            Camera(
                world_to_view=m,
                view_to_clip=jnp.asarray(
                    perspective(np.pi / 2, 1.0, near, 1e4)
                ),
                near=jnp.float32(near),
                far=jnp.float32(1e4),
                width=size,
                height=size,
            )
        )
    return cams


def dominant_face(d):
    """Face index by dominant direction component (G9:58-69).
    d: (..., 3) -> int32 face 0..5 in GL order."""
    ax = jnp.abs(d)
    axis = jnp.argmax(ax, axis=-1)
    comp = jnp.take_along_axis(d, axis[..., None], axis=-1)[..., 0]
    return (axis * 2 + (comp < 0).astype(jnp.int32)).astype(jnp.int32)


@partial(jax.jit, static_argnames=("size",))
def _shadow_prep(splats: Splats, light_pos, far, std_dev, size: int,
                 model_to_world=None):
    """One fused dispatch: face assignment, radial depths, all 6 face
    projections, and per-face (pair, col) budget requirements. Eager op-by-
    op orchestration costs ~50ms/dispatch on a tunneled device, so the whole
    prep is a single program."""
    from .binning import required_overflow

    ws = _world_pos(splats, model_to_world)
    splat_face = dominant_face(ws - light_pos)
    cams = face_cameras(light_pos, far, size)
    radial = jnp.linalg.norm(ws - light_pos, axis=-1) / far

    projs, needs = [], []
    for f in range(6):
        in_face = jnp.logical_and(splats.valid, splat_face == f)
        pr = project_splats(
            dataclasses.replace(splats, valid=in_face), cams[f],
            std_dev=std_dev, splat_format=SplatFormat.MESH2SPLAT,
            model_to_world=model_to_world,
        )
        projs.append(pr)
        needs.append(required_overflow(pr, size, size))
    return radial, tuple(projs), jnp.stack(needs)


def _world_pos(splats: Splats, model_to_world):
    """Splat centers in world space (the shadow CS applies the model matrix
    before face binning, G9 parity)."""
    if model_to_world is None:
        return splats.pos
    M = model_to_world
    return splats.pos @ M[:3, :3].T + M[:3, 3]


@partial(jax.jit, static_argnames=("size",))
def _shadow_prep_fused(splats: Splats, light_pos, far, std_dev, size: int,
                       model_to_world=None):
    """Fused-cubemap prep: ONE merged projection over all 6 faces.

    Each splat belongs to exactly one face (dominant light-space direction,
    G9:58-69), so instead of 6 N-capacity passes the 6 per-face projections
    are SELECTED per splat into one N-capacity ProjectedSplats whose
    mean_ndc.y is remapped into a (6*size, size) tall image — face f's
    viewport becomes the row band [f*size, (f+1)*size). One binning call
    with a per-splat tile-row band clamp (the per-face scissor) + one
    min-depth kernel then render all 6 faces in a single dispatch, replacing
    the reference's 6 sequential instanced draws
    (GaussianShadowPass.cpp:156-236) AND round-3's 6 sequential jit
    dispatches with up to 6 compile variants."""
    from .binning import TILE_H, required_overflow

    ws = _world_pos(splats, model_to_world)
    splat_face = dominant_face(ws - light_pos)
    cams = face_cameras(light_pos, far, size)
    radial = jnp.linalg.norm(ws - light_pos, axis=-1) / far

    projs = [
        project_splats(splats, cams[f], std_dev=std_dev,
                       splat_format=SplatFormat.MESH2SPLAT,
                       model_to_world=model_to_world)
        for f in range(6)
    ]

    def sel(field_name):
        stacked = jnp.stack([getattr(p, field_name) for p in projs])
        f6 = splat_face.reshape((1, -1) + (1,) * (stacked.ndim - 2))
        return jnp.take_along_axis(
            stacked, jnp.broadcast_to(f6, (1,) + stacked.shape[1:]), axis=0
        )[0]

    mean_ndc = sel("mean_ndc")
    facef = splat_face.astype(jnp.float32)
    # face-local window y mpy = (ndc_y+1)*size/2 -> tall-image
    # mpy' = mpy + (5-f)*size, re-expressed in tall-image ndc (H = 6*size)
    ndc_y = ((mean_ndc[:, 1] + 1.0) / 6.0 + (5.0 - facef) / 3.0) - 1.0
    mean_ndc = jnp.stack([mean_ndc[:, 0], ndc_y], axis=1)

    merged = ProjectedSplats(
        mean_ndc=mean_ndc,
        axes_px=sel("axes_px"),
        conic=sel("conic"),
        depth=radial,                      # min-composite key
        color=sel("color"),
        normal=sel("normal"),
        wspos=sel("wspos"),
        pbr=sel("pbr"),
        valid=sel("valid"),
    )
    tiles_per_face = size // TILE_H
    ty_lo = splat_face * tiles_per_face
    band = (ty_lo, ty_lo + (tiles_per_face - 1))
    need = required_overflow(merged, size, 6 * size, band)
    return merged, band, need


@partial(jax.jit, static_argnames=("size", "pair_capacity"))
def _fused_min_raster(merged, band, size: int, pair_capacity: int):
    """ONE binning + ONE min-depth Pallas dispatch for all 6 cubemap faces
    (stacked as row bands of a (6*size, size) tall image, band-clamped so
    no face bleeds into its neighbor). Returns (6, size, size) with
    uncovered pixels at 1.0 (= far)."""
    from . import binning as B
    from . import composite as C
    from .tiled import _is_tpu

    h = 6 * size
    binned = B.bin_pairs(
        merged, size, h, pair_capacity, variant="depth",
        differentiable=False, band_ty=band,
    )
    ty, tx = B.tiles_for(size, h)
    out = C.min_depth_tiles(
        binned, jnp.asarray([h], jnp.int32), ty, tx, not _is_tpu(),
    )
    depth = out[0, :h, :size].reshape(6, size, size)
    return jnp.where(depth > 1e37, 1.0, depth)


def render_shadow_cubemap(
    splats: Splats,
    light_pos,
    far,
    std_dev,
    size: int = 1024,
    chunk: int = 256,
    method: str = "auto",
    pair_capacity: int = 0,
    model_to_world=None,
) -> ShadowCubemap:
    """Render all 6 faces. Defaults to the reference's 1024^2 faces
    (GaussianShadowPass.cpp:14-19).

    method: "dense" evaluates every (splat, pixel) pair — exact radial min,
    O(N * size^2), fine for small maps/tests. "tiled" renders ALL 6 faces
    in one binning + one tile-binned MIN-depth Pallas dispatch (faces
    stacked as bands of a (6*size, size) image with a per-splat band
    scissor) — the exact depth-test semantics of the reference's 6
    instanced depth-only draws (GaussianShadowPass.cpp:156-236) in a single
    compile. "auto" picks tiled for production sizes.
    """
    light_pos = jnp.asarray(light_pos, jnp.float32)
    far = jnp.asarray(far, jnp.float32)

    if method == "auto":
        method = "tiled" if size >= 512 or splats.capacity > 65536 else "dense"

    if method == "tiled":
        from .binning import TILE_H

        if size % TILE_H:
            # _shadow_prep_fused's per-face band scissor assumes each face
            # is a whole number of tile rows; a misaligned size would bleed
            # bands across faces
            raise ValueError(
                f"tiled shadow size must be a multiple of {TILE_H}"
            )
        merged, band, need = _shadow_prep_fused(
            splats, light_pos, far, std_dev, size, model_to_world
        )
        cap = pair_capacity or (1 << max(int(need) - 1, 8192).bit_length())
        faces = _fused_min_raster(merged, band, size, cap)
    else:
        radial, projs, _ = _shadow_prep(
            splats, light_pos, far, std_dev, size, model_to_world
        )
        faces = jnp.stack([
            _min_rasterize_face(projs[f], radial, size, chunk)
            for f in range(6)
        ])
    return ShadowCubemap(faces=faces, light_pos=light_pos, far=far)


def _min_rasterize_face(proj, radial, size: int, chunk: int):
    """Per-pixel min of radial depth over covering quad parallelograms —
    the depth-test semantics of the 6 instanced shadow draws."""
    n = proj.capacity
    res_half = size * 0.5
    mean_px = (proj.mean_ndc + 1.0) * res_half
    axes = proj.axes_px
    valid = proj.valid

    xs = jnp.arange(size, dtype=jnp.float32) + 0.5
    ys = jnp.asarray(size, jnp.float32) - (jnp.arange(size, dtype=jnp.float32) + 0.5)
    px = jnp.broadcast_to(xs[None, :], (size, size))
    py = jnp.broadcast_to(ys[:, None], (size, size))

    pad = (-n) % chunk

    def chunked(a):
        return jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)).reshape(
            (n + pad) // chunk, chunk, *a.shape[1:]
        )

    xs_c = (chunked(mean_px), chunked(axes), chunked(radial),
            chunked(valid.astype(jnp.float32)))

    def body(depth_min, cvals):
        c_mean, c_axes, c_rad, c_val = cvals
        fx = px[None] - c_mean[:, 0, None, None]
        fy = py[None] - c_mean[:, 1, None, None]
        mj = c_axes[:, 0]
        mn = c_axes[:, 1]
        det = mj[:, 0] * mn[:, 1] - mn[:, 0] * mj[:, 1]
        det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)[:, None, None]
        u = (fx * mn[:, 1, None, None] - mn[:, 0, None, None] * fy) / det
        v = (mj[:, 0, None, None] * fy - fx * mj[:, 1, None, None]) / det
        inside = (jnp.abs(u) <= 1) & (jnp.abs(v) <= 1) & (c_val[:, None, None] > 0.5)
        z = jnp.where(inside, c_rad[:, None, None], jnp.inf)
        return jnp.minimum(depth_min, jnp.min(z, axis=0)), None

    depth, _ = jax.lax.scan(
        body, jnp.full((size, size), jnp.inf, jnp.float32), xs_c
    )
    return jnp.where(jnp.isinf(depth), 1.0, depth)


def sample_cubemap(faces: jax.Array, directions: jax.Array,
                   filter_linear: bool = False) -> jax.Array:
    """Sample a (6, S, S) cubemap by direction (..., 3), GL face/uv
    conventions (reference cube math: src/utils/utils.cpp:182-268).

    Default nearest + edge clamp = the reference's shadow cubemap sampler
    state (GL_NEAREST / GL_CLAMP_TO_EDGE, GaussianShadowPass.cpp:22-26).
    filter_linear=True adds within-face bilinear filtering (smoother PCF
    penumbrae than the reference; face borders stay clamped)."""
    s = faces.shape[1]
    x, y, z = directions[..., 0], directions[..., 1], directions[..., 2]
    ax, ay, az = jnp.abs(x), jnp.abs(y), jnp.abs(z)
    face = dominant_face(directions)

    ma = jnp.maximum(jnp.maximum(ax, ay), az)
    ma = jnp.maximum(ma, 1e-12)

    # (sc, tc) per GL spec
    sc = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-z, z, x, x, x, -x],
    )
    tc = jnp.select(
        [face == 0, face == 1, face == 2, face == 3, face == 4, face == 5],
        [-y, -y, z, -z, -y, -y],
    )
    u = (sc / ma + 1.0) * 0.5
    v = (tc / ma + 1.0) * 0.5
    # v grows downward in texture space; face textures here are stored with
    # row 0 = top which matches v=0 at top after the render flip
    if not filter_linear:
        ui = jnp.clip((u * s).astype(jnp.int32), 0, s - 1)
        vi = jnp.clip((v * s).astype(jnp.int32), 0, s - 1)
        return faces[face, vi, ui]

    uf = u * s - 0.5
    vf = v * s - 0.5
    u0 = jnp.floor(uf)
    v0 = jnp.floor(vf)
    fu = uf - u0
    fv = vf - v0
    u0i = jnp.clip(u0.astype(jnp.int32), 0, s - 1)
    v0i = jnp.clip(v0.astype(jnp.int32), 0, s - 1)
    u1i = jnp.clip(u0i + 1, 0, s - 1)
    v1i = jnp.clip(v0i + 1, 0, s - 1)
    t00 = faces[face, v0i, u0i]
    t01 = faces[face, v0i, u1i]
    t10 = faces[face, v1i, u0i]
    t11 = faces[face, v1i, u1i]
    return (t00 * (1 - fu) * (1 - fv) + t01 * fu * (1 - fv)
            + t10 * (1 - fu) * fv + t11 * fu * fv)


def pcf_shadow_factor(
    cubemap: ShadowCubemap,
    ws_pos: jax.Array,   # (..., 3)
    bias: float = 0.05,
    disk_radius: float = 0.025,
) -> jax.Array:
    """20-tap PCF (deferredPS:70-99). Returns shadow in [0, 1]."""
    light_dir = ws_pos - cubemap.light_pos
    current = jnp.linalg.norm(light_dir, axis=-1)
    sample_dir = light_dir / (current[..., None] + 1e-12)

    offsets = jnp.asarray(_PCF_OFFSETS) * disk_radius  # (20, 3)
    dirs = sample_dir[..., None, :] + offsets  # (..., 20, 3)
    closest = sample_cubemap(cubemap.faces, dirs) * cubemap.far  # (..., 20)
    hit = (current[..., None] - bias > closest).astype(jnp.float32)
    return jnp.mean(hit, axis=-1)
