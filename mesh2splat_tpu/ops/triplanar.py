"""Triplanar ("orthogonal UV") projection + UV->3D Jacobian, per triangle.

TPU-native reformulation of the reference's geometry shader
(reference: src/shaders/conversion/converterGS.glsl:326-443): instead of one
GS invocation per primitive we vmap dense per-triangle math over the whole
mesh. All conventions (edge reordering, dominant-axis pick, bbox-normalized
UVs, frame -> quaternion, J = V * UV^-1) match the GLSL exactly and are
tested against hand-computed triangles.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .quat import mat_to_quat

EPS = 1e-12


def _reorder_longest_edge(v0, v1, v2):
    """Replicates converterGS.glsl:327-342: edge1 <- the longest of
    (v1-v0, v2-v0, v2-v1); edge2 keeps/receives the displaced edge."""
    e1 = v1 - v0
    e2 = v2 - v0
    e3 = v2 - v1
    l1 = jnp.linalg.norm(e1, axis=-1)
    l2 = jnp.linalg.norm(e2, axis=-1)
    l3 = jnp.linalg.norm(e3, axis=-1)

    swap2 = jnp.logical_and(l2 > l1, l2 > l3)
    swap3 = jnp.logical_and(~swap2, jnp.logical_and(l3 > l1, l3 > l2))

    edge1 = jnp.where(swap2[..., None], e2, jnp.where(swap3[..., None], e3, e1))
    edge2 = jnp.where(swap2[..., None], e1, e2)  # swap2 exchanges e1<->e2
    return edge1, edge2


def triangle_frame(v0, v1, v2):
    """Returns (edge1_unit, geometric_normal) per converterGS.glsl:344-347."""
    edge1, edge2 = _reorder_longest_edge(v0, v1, v2)
    edge1 = edge1 / (jnp.linalg.norm(edge1, axis=-1, keepdims=True) + EPS)
    n = jnp.cross(edge1, edge2)
    n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + EPS)
    return edge1, n


def orthogonal_uv(pos, normal, bbox_min, bbox_max):
    """Triplanar projection of world positions to [0,1]^2 normalized by the
    longest in-plane bbox range (reference: converterGS.glsl:349-399).

    pos: (..., 3); normal: (..., 3) geometric triangle normal (broadcastable).
    """
    an = jnp.abs(normal)
    ax, ay, az = an[..., 0], an[..., 1], an[..., 2]
    use_x = jnp.logical_and(ax > ay, ax > az)
    use_y = jnp.logical_and(~use_x, ay > az)

    rng = bbox_max - bbox_min
    rel = pos - bbox_min

    # X-dominant: (u, v) = (relY, relZ) / max(rangeY, rangeZ)
    range_x = jnp.maximum(rng[..., 1], rng[..., 2])
    uv_x = jnp.stack([rel[..., 1], rel[..., 2]], axis=-1) / (range_x[..., None] + EPS)
    # Y-dominant: (u, v) = (relX, relZ) / max(rangeX, rangeZ)
    range_y = jnp.maximum(rng[..., 0], rng[..., 2])
    uv_y = jnp.stack([rel[..., 0], rel[..., 2]], axis=-1) / (range_y[..., None] + EPS)
    # Z-dominant: (u, v) = (relX, relY) / max(rangeX, rangeY)
    range_z = jnp.maximum(rng[..., 0], rng[..., 1])
    uv_z = jnp.stack([rel[..., 0], rel[..., 1]], axis=-1) / (range_z[..., None] + EPS)

    return jnp.where(
        use_x[..., None], uv_x, jnp.where(use_y[..., None], uv_y, uv_z)
    )


def uv3d_jacobian(p0, p1, p2, uv0, uv1, uv2):
    """J = V * UV^-1 : d(position)/d(uv), shape (..., 3, 2)
    (reference: converterGS.glsl:269-300). Column 0 = dP/du, column 1 = dP/dv."""
    du1 = uv1 - uv0
    du2 = uv2 - uv0
    # UV matrix columns (du1, du2); inverse of [[a, c], [b, d]] with
    # a=du1.x b=du1.y c=du2.x d=du2.y
    a, b = du1[..., 0], du1[..., 1]
    c, d = du2[..., 0], du2[..., 1]
    det = a * d - c * b
    safe_det = jnp.where(jnp.abs(det) < EPS, 1.0, det)
    inv = jnp.where(
        (jnp.abs(det) < EPS)[..., None, None],
        jnp.zeros((*det.shape, 2, 2), det.dtype),
        jnp.stack(
            [
                jnp.stack([d, -c], axis=-1),
                jnp.stack([-b, a], axis=-1),
            ],
            axis=-2,
        )
        / safe_det[..., None, None],
    )
    V = jnp.stack([p1 - p0, p2 - p0], axis=-1)  # (..., 3, 2)
    return V @ inv


def triangle_conversion_attrs(tri_pos, bbox_min, bbox_max, ouv_override=None):
    """All per-triangle conversion quantities in one vmappable pass.

    tri_pos: (T, 3, 3). Returns dict with
      ortho_uv (T, 3, 2), quat (T, 4) wxyz, scale (T, 3), normal_geo (T, 3).
    (reference: converterGS.glsl:326-443 main())

    ouv_override: (T, 3, 2) custom conversion UVs (e.g. from
    ops.uv_unwrap.unwrap_normalized_uvs — the reference's disabled
    normalized-UV path, normalizedUvUnwrapping.cpp); the Jacobian then
    measures position change per custom-UV unit."""
    v0, v1, v2 = tri_pos[:, 0], tri_pos[:, 1], tri_pos[:, 2]
    edge1, normal = triangle_frame(v0, v1, v2)

    if ouv_override is not None:
        ouv = ouv_override
    else:
        ouv = orthogonal_uv(tri_pos, normal[:, None, :], bbox_min, bbox_max)  # (T,3,2)

    # tangent frame -> quaternion (converterGS.glsl:401-407); mat3(x,y,z)
    # has the axes as columns, and quat_cast consumes that matrix.
    x_axis = edge1
    y_axis = jnp.cross(normal, x_axis)
    y_axis = y_axis / (jnp.linalg.norm(y_axis, axis=-1, keepdims=True) + EPS)
    z_axis = normal
    R = jnp.stack([x_axis, y_axis, z_axis], axis=-1)  # columns
    quat = mat_to_quat(R)  # (w,x,y,z) — the GS reorders glm's xyzw to wxyz

    J = uv3d_jacobian(v0, v1, v2, ouv[:, 0], ouv[:, 1], ouv[:, 2])  # (T,3,2)
    ju = jnp.linalg.norm(J[..., 0], axis=-1)
    jv = jnp.linalg.norm(J[..., 1], axis=-1)
    scale = jnp.stack([ju, jv, jnp.full_like(ju, 1e-7)], axis=-1)

    return {
        "ortho_uv": ouv,
        "quat": quat,
        "scale": scale,
        "normal_geo": normal,
    }
