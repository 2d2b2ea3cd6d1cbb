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


@partial(jax.jit, static_argnames=("size", "splat_format"))
def _shadow_prep(splats: Splats, light_pos, far, std_dev, size: int,
                 model_to_world=None,
                 splat_format: SplatFormat = SplatFormat.MESH2SPLAT):
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
            std_dev=std_dev, splat_format=splat_format,
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


@partial(jax.jit, static_argnames=("size", "splat_format"))
def _shadow_prep_fused(splats: Splats, light_pos, far, std_dev, size: int,
                       model_to_world=None,
                       splat_format: SplatFormat = SplatFormat.MESH2SPLAT):
    """Fused-cubemap prep: ONE single-pass projection over all 6 faces.

    Each splat belongs to exactly one face (dominant light-space direction,
    G9:58-69), and all 6 face cameras share ONE 90-degree perspective with
    CONSTANT rotations — so instead of 6 N-capacity projections + 6-way
    gathers (round 4: ~700 ms at 1.5M splats on v5e), the face rotation
    entries are selected per splat with a tiny (N, 6) one-hot contraction
    and the whole EWA pipeline (transcribed from ops/projection.py:133-280,
    itself G4:58-204) runs ONCE, elementwise. mean_ndc.y is remapped into a
    (6*size, size) tall image — face f's viewport is the row band
    [f*size, (f+1)*size). One binning call with a per-splat tile-row band
    clamp (the per-face scissor) + one min-depth kernel then render all 6
    faces in a single dispatch, replacing the reference's 6 sequential
    instanced draws (GaussianShadowPass.cpp:156-236)."""
    from .binning import TILE_H, required_overflow

    n = splats.capacity
    light_pos = jnp.asarray(light_pos, jnp.float32)
    ws = _world_pos(splats, model_to_world)
    d = ws - light_pos
    splat_face = dominant_face(d)
    radial = jnp.linalg.norm(d, axis=-1) / far

    # constant face rotations (look_at of the axis-aligned dirs); per-splat
    # entries via one-hot contraction — no gathers, MXU/VPU-friendly
    rot6 = np.stack([
        look_at(np.zeros(3), _FACE_DIRS[f], _FACE_UPS[f])[:3, :3]
        for f in range(6)
    ])  # (6, 3, 3)
    onehot = jax.nn.one_hot(splat_face, 6, dtype=jnp.float32)  # (N, 6)
    Rsel = onehot @ jnp.asarray(rot6.reshape(6, 9), jnp.float32)  # (N, 9)
    w00, w01, w02, w10, w11, w12, w20, w21, w22 = (
        Rsel[:, k] for k in range(9)
    )

    # shared 90-degree projection (face_cameras): p00 = p11 = 1
    near, farp = 0.1, 1e4
    p00 = p11 = np.float32(1.0)
    p22 = np.float32(-(farp + near) / (farp - near))
    p23 = np.float32(-2.0 * farp * near / (farp - near))

    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    vsx = w00 * dx + w01 * dy + w02 * dz
    vsy = w10 * dx + w11 * dy + w12 * dz
    vsz = w20 * dx + w21 * dy + w22 * dz
    cx = p00 * vsx
    cy = p11 * vsy
    cz = p22 * vsz + p23
    cw = -vsz

    # frustum cull at 1.05*w (G4:72-76); the dominant-face assignment
    # guarantees |cx|,|cy| <= w, so this mainly rejects near-plane splats
    margin = 1.05 * cw
    inside = (
        (cz >= -margin) & (cx >= -margin) & (cx <= margin)
        & (cy >= -margin) & (cy <= margin)
    )
    valid = jnp.logical_and(splats.valid, inside)

    # scale decode + cov3d = R S^2 R^T (projection.py:170-218 transcription)
    if model_to_world is None:
        model_scale = jnp.ones(3, jnp.float32)
    else:
        model_scale = jnp.linalg.norm(model_to_world[:3, :3], axis=0)
    # format-dependent sigma (G4:93-95): raw mesh2splat scales need the
    # std_dev multiplier; imported 3DGS PLY scales are already real units
    mult = std_dev if int(splat_format) in (0, 3) else 1.0
    s0 = splats.scale[:, 0] * mult * (model_scale[0] * model_scale[0])
    s1 = splats.scale[:, 1] * mult * (model_scale[1] * model_scale[1])
    s2 = splats.scale[:, 2] * mult * (model_scale[2] * model_scale[2])

    qw, qx, qy, qz = (
        splats.quat[:, 0], splats.quat[:, 1],
        splats.quat[:, 2], splats.quat[:, 3],
    )
    r00 = 1.0 - 2.0 * (qy * qy + qz * qz)
    r01 = 2.0 * (qx * qy - qw * qz)
    r02 = 2.0 * (qx * qz + qw * qy)
    r10 = 2.0 * (qx * qy + qw * qz)
    r11 = 1.0 - 2.0 * (qx * qx + qz * qz)
    r12 = 2.0 * (qy * qz - qw * qx)
    r20 = 2.0 * (qx * qz - qw * qy)
    r21 = 2.0 * (qy * qz + qw * qx)
    r22 = 1.0 - 2.0 * (qy * qy + qx * qx)
    if model_to_world is not None:
        mr = model_to_world[:3, :3] / jnp.maximum(model_scale, 1e-12)
        r00, r10, r20 = (
            mr[0, 0] * r00 + mr[0, 1] * r10 + mr[0, 2] * r20,
            mr[1, 0] * r00 + mr[1, 1] * r10 + mr[1, 2] * r20,
            mr[2, 0] * r00 + mr[2, 1] * r10 + mr[2, 2] * r20,
        )
        r01, r11, r21 = (
            mr[0, 0] * r01 + mr[0, 1] * r11 + mr[0, 2] * r21,
            mr[1, 0] * r01 + mr[1, 1] * r11 + mr[1, 2] * r21,
            mr[2, 0] * r01 + mr[2, 1] * r11 + mr[2, 2] * r21,
        )
        r02, r12, r22 = (
            mr[0, 0] * r02 + mr[0, 1] * r12 + mr[0, 2] * r22,
            mr[1, 0] * r02 + mr[1, 1] * r12 + mr[1, 2] * r22,
            mr[2, 0] * r02 + mr[2, 1] * r12 + mr[2, 2] * r22,
        )

    q0, q1, q2 = s0 * s0, s1 * s1, s2 * s2
    c00 = r00 * r00 * q0 + r01 * r01 * q1 + r02 * r02 * q2
    c01 = r00 * r10 * q0 + r01 * r11 * q1 + r02 * r12 * q2
    c02 = r00 * r20 * q0 + r01 * r21 * q1 + r02 * r22 * q2
    c11 = r10 * r10 * q0 + r11 * r11 * q1 + r12 * r12 * q2
    c12 = r10 * r20 * q0 + r11 * r21 * q1 + r12 * r22 * q2
    c22 = r20 * r20 * q0 + r21 * r21 * q1 + r22 * r22 * q2

    # EWA Jacobian with the per-splat face rotation as W (G4:152-169)
    z_safe = jnp.where(jnp.abs(vsz) < 1e-8, -1e-8, vsz)
    jsx = -(p00 * size) / (2.0 * z_safe)
    jsy = -(p11 * size) / (2.0 * z_safe)
    jtx = (p00 * vsx * size) / (2.0 * z_safe * z_safe)
    jty = (p11 * vsy * size) / (2.0 * z_safe * z_safe)
    u0 = jsx * w00 + jtx * w20
    u1 = jsx * w01 + jtx * w21
    u2 = jsx * w02 + jtx * w22
    v0 = jsy * w10 + jty * w20
    v1 = jsy * w11 + jty * w21
    v2 = jsy * w12 + jty * w22

    cu0 = c00 * u0 + c01 * u1 + c02 * u2
    cu1 = c01 * u0 + c11 * u1 + c12 * u2
    cu2 = c02 * u0 + c12 * u1 + c22 * u2
    a = u0 * cu0 + u1 * cu1 + u2 * cu2 + 0.3
    b = v0 * cu0 + v1 * cu1 + v2 * cu2
    cv0 = c00 * v0 + c01 * v1 + c02 * v2
    cv1 = c01 * v0 + c11 * v1 + c12 * v2
    cv2 = c02 * v0 + c12 * v1 + c22 * v2
    c = v0 * cv0 + v1 * cv1 + v2 * cv2 + 0.3

    mid = a + c
    delta = jnp.sqrt((a - c) ** 2 + (2.0 * b) ** 2)
    lam2 = 0.5 * (mid - delta)
    valid = jnp.logical_and(valid, lam2 >= 0.0)

    det = a * c - b * b
    det_ok = jnp.abs(det) >= 1e-20
    det_safe = jnp.where(det_ok, det, 1.0)
    zero = jnp.zeros_like(det)
    conic = jnp.stack(
        [
            jnp.where(det_ok, c / det_safe, zero),
            jnp.where(det_ok, -b / det_safe, zero),
            jnp.where(det_ok, a / det_safe, zero),
        ],
        axis=-1,
    )
    from ..ops.projection import axes_from_conic

    mjx, mjy, mnx, mny = axes_from_conic(
        conic[:, 0], conic[:, 1], conic[:, 2]
    )
    axes_px = jnp.stack([mjx, mjy, mnx, mny], axis=-1).reshape(-1, 2, 2)

    w_safe = jnp.where(jnp.abs(cw) < 1e-12, 1e-12, cw)
    facef = splat_face.astype(jnp.float32)
    # face-local window y mpy = (ndc_y+1)*size/2 -> tall-image
    # mpy' = mpy + (5-f)*size, re-expressed in tall-image ndc (H = 6*size)
    ndc_y_face = cy / w_safe
    ndc_y = ((ndc_y_face + 1.0) / 6.0 + (5.0 - facef) / 3.0) - 1.0
    mean_ndc = jnp.stack([cx / w_safe, ndc_y], axis=1)

    zeros3 = jnp.zeros((n, 3), jnp.float32)
    merged = ProjectedSplats(
        mean_ndc=mean_ndc,
        axes_px=axes_px,
        conic=conic,
        depth=radial,                      # min-composite key
        color=jnp.zeros((n, 4), jnp.float32),  # unused by the depth variant
        normal=zeros3,
        wspos=ws,
        pbr=jnp.zeros((n, 2), jnp.float32),
        valid=valid,
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
    splat_format: SplatFormat = SplatFormat.MESH2SPLAT,
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
            splats, light_pos, far, std_dev, size, model_to_world,
            splat_format,
        )
        from .binning import round_pow2_budget

        cap = pair_capacity or round_pow2_budget(need)
        faces = _fused_min_raster(merged, band, size, cap)
    else:
        radial, projs, _ = _shadow_prep(
            splats, light_pos, far, std_dev, size, model_to_world,
            splat_format,
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
