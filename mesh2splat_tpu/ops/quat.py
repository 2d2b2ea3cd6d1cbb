"""Quaternion / rotation utilities with the reference's exact conventions.

Storage order everywhere in this framework is (w, x, y, z), matching the
reference SSBO field ``rotation`` (reference:
src/shaders/conversion/converterGS.glsl:407 packs vec4(q.w, q.x, q.y, q.z)).

``quat_to_mat`` returns the *standard* rotation matrix R such that for the
GLSL consumer (reference: src/shaders/rendering/common.glsl:22-47, which
builds columns) the covariance ends up Sigma = R diag(s^2) R^T -- verified in
tests against a literal transcription of the GLSL.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q, eps=1e-12):
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def quat_to_mat(q):
    """(..., 4) wxyz -> (..., 3, 3) standard rotation matrix (acts on column
    vectors: v' = R @ v). Matches common.glsl:22-47 semantics: the GLSL code
    stores R^T in column-major which, combined with computeCov3D's
    Sigma = (S*Rglsl)^T (S*Rglsl), yields Sigma = R S^2 R^T with this R."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def mat_to_quat(R):
    """(..., 3, 3) -> (..., 4) wxyz. Branch-free transcription of GLM's
    quat_cast (reference: src/shaders/conversion/converterGS.glsl:131-183,
    itself copied from GLM), vectorized with jnp.where instead of branches.

    R is the standard (row-major, acts-on-column-vectors) rotation matrix.
    The GLSL version indexes m[col][row] on a column-major matrix whose
    columns are the frame axes; with our convention the frame axes are also
    columns, so m[c][r] in GLSL == R[r, c] here... but note the GLSL code was
    fed mat3(xAxis, yAxis, zAxis) whose *mathematical* matrix has the axes as
    columns, and GLSL m[i][j] is column i, row j. Hence glsl m[i][j] == R[j, i].
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    # GLSL g[i][j] = R[j, i]
    g01, g02, g10 = m10, m20, m01
    g12, g20, g21 = m21, m02, m12

    four_x = m00 - m11 - m22
    four_y = m11 - m00 - m22
    four_z = m22 - m00 - m11
    four_w = m00 + m11 + m22

    cands = jnp.stack([four_w, four_x, four_y, four_z], axis=-1)
    biggest_index = jnp.argmax(cands, axis=-1)
    biggest = jnp.max(cands, axis=-1)
    biggest_val = jnp.sqrt(jnp.maximum(biggest + 1.0, 0.0)) * 0.5
    mult = 0.25 / jnp.maximum(biggest_val, 1e-20)

    # biggestIndex == 0 (w)
    q0 = jnp.stack(
        [biggest_val, (g12 - g21) * mult, (g20 - g02) * mult, (g01 - g10) * mult],
        axis=-1,
    )
    # biggestIndex == 1 (x)
    q1 = jnp.stack(
        [(g12 - g21) * mult, biggest_val, (g01 + g10) * mult, (g20 + g02) * mult],
        axis=-1,
    )
    # biggestIndex == 2 (y)
    q2 = jnp.stack(
        [(g20 - g02) * mult, (g01 + g10) * mult, biggest_val, (g12 + g21) * mult],
        axis=-1,
    )
    # biggestIndex == 3 (z)
    q3 = jnp.stack(
        [(g01 - g10) * mult, (g20 + g02) * mult, (g12 + g21) * mult, biggest_val],
        axis=-1,
    )

    stacked = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    return jnp.take_along_axis(
        stacked, biggest_index[..., None, None].astype(jnp.int32), axis=-2
    ).squeeze(-2)


def quat_mul(q1, q2):
    """Hamilton product, wxyz order."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def covariance_from_quat_scale(q, s):
    """Sigma = R diag(s^2) R^T  (reference: src/shaders/rendering/common.glsl:49-60,
    where M = S * Rglsl and Sigma = M^T M)."""
    R = quat_to_mat(q)
    return jnp.einsum("...ij,...j,...kj->...ik", R, s * s, R)
