"""Quaternion convention tests against literal GLSL transcriptions
(SURVEY.md section 4 test item 1)."""

import numpy as np
import jax.numpy as jnp
import pytest

from mesh2splat_tpu.ops import quat as Q


def glsl_cast_quat_to_mat3(quat):
    """Literal transcription of common.glsl:22-47. Input vec4 components
    (x,y,z,w) hold (w,x,y,z). Returns the *mathematical* matrix represented
    by the GLSL column-major mat3 (columns = firstRow/secondRow/thirdRow)."""
    qx, qy, qz, qw = quat  # vec4 channels
    first = np.array([
        1 - 2 * (qz * qz + qw * qw),
        2 * (qy * qz - qx * qw),
        2 * (qy * qw + qx * qz),
    ])
    second = np.array([
        2 * (qy * qz + qx * qw),
        1 - 2 * (qy * qy + qw * qw),
        2 * (qz * qw - qx * qy),
    ])
    third = np.array([
        2 * (qy * qw - qx * qz),
        2 * (qz * qw + qx * qy),
        1 - 2 * (qy * qy + qz * qz),
    ])
    # mat3(a, b, c) sets COLUMNS
    return np.stack([first, second, third], axis=1)


def glsl_compute_cov3d(quat_vec4, scales):
    """Literal transcription of common.glsl:49-60."""
    Rg = glsl_cast_quat_to_mat3(quat_vec4)
    S = np.diag(scales)
    M = S @ Rg
    return M.T @ M


def random_unit_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_cov3d_matches_glsl():
    """covariance_from_quat_scale must equal the GLSL Sigma = (S Rglsl)^T (S Rglsl)."""
    quats = random_unit_quats(32)
    rng = np.random.default_rng(1)
    scales = rng.uniform(0.1, 2.0, size=(32, 3))
    ours = np.asarray(Q.covariance_from_quat_scale(jnp.asarray(quats), jnp.asarray(scales)))
    for i in range(32):
        ref = glsl_compute_cov3d(quats[i], scales[i])
        np.testing.assert_allclose(ours[i], ref, atol=1e-5)


def test_quat_to_mat_is_rotation():
    quats = random_unit_quats(64, seed=2)
    R = np.asarray(Q.quat_to_mat(jnp.asarray(quats)))
    eye = np.broadcast_to(np.eye(3), R.shape)
    np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_mat_quat_roundtrip():
    quats = random_unit_quats(128, seed=3)
    # canonicalize sign (q and -q are the same rotation)
    R = Q.quat_to_mat(jnp.asarray(quats))
    q2 = np.asarray(Q.mat_to_quat(R))
    dot = np.abs(np.sum(q2 * quats, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_mat_to_quat_identity_and_axes():
    np.testing.assert_allclose(
        np.asarray(Q.mat_to_quat(jnp.eye(3))), [1, 0, 0, 0], atol=1e-6
    )
    # 90 deg about z
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    q = np.asarray(Q.mat_to_quat(jnp.asarray(Rz)))
    s = np.sqrt(0.5)
    assert np.allclose(np.abs(q), [s, 0, 0, s], atol=1e-6)


def test_quat_mul_matches_matmul():
    qa = random_unit_quats(16, seed=4)
    qb = random_unit_quats(16, seed=5)
    qc = Q.quat_mul(jnp.asarray(qa), jnp.asarray(qb))
    Rc = np.asarray(Q.quat_to_mat(qc))
    Ra = np.asarray(Q.quat_to_mat(jnp.asarray(qa)))
    Rb = np.asarray(Q.quat_to_mat(jnp.asarray(qb)))
    np.testing.assert_allclose(Rc, Ra @ Rb, atol=1e-5)
