"""Unit tests: triplanar UV mapping & Jacobian vs hand-computed triangles
(SURVEY.md section 4 test item 1; reference: converterGS.glsl:269-300,349-399)."""

import numpy as np
import jax.numpy as jnp

from mesh2splat_tpu.ops import triplanar as TP
from mesh2splat_tpu.ops.quat import quat_to_mat


def test_orthogonal_uv_z_dominant():
    # triangle in the z=0 plane, bbox [0,2]x[0,1]x[0,0] -> range = max(2,1) = 2
    pos = jnp.asarray([[0.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    n = jnp.asarray([0.0, 0.0, 1.0])
    uv = np.asarray(
        TP.orthogonal_uv(pos, n, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([2.0, 1.0, 0.0]))
    )
    np.testing.assert_allclose(uv, [[0, 0], [1, 0], [0, 0.5]], atol=1e-6)


def test_orthogonal_uv_x_dominant():
    # X-dominant normal: (u,v) = (relY, relZ) / max(rangeY, rangeZ)
    pos = jnp.asarray([[5.0, 1.0, 2.0]])
    n = jnp.asarray([1.0, 0.1, 0.1])
    uv = np.asarray(
        TP.orthogonal_uv(
            pos, n, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([10.0, 4.0, 8.0])
        )
    )
    np.testing.assert_allclose(uv, [[1 / 8, 2 / 8]], atol=1e-6)


def test_jacobian_identity_mapping():
    # UV == XY of the triangle -> J = [[1,0],[0,1],[0,0]]
    p0 = jnp.asarray([0.0, 0.0, 0.0])
    p1 = jnp.asarray([1.0, 0.0, 0.0])
    p2 = jnp.asarray([0.0, 1.0, 0.0])
    J = np.asarray(
        TP.uv3d_jacobian(
            p0, p1, p2,
            jnp.asarray([0.0, 0.0]), jnp.asarray([1.0, 0.0]), jnp.asarray([0.0, 1.0]),
        )
    )
    np.testing.assert_allclose(J, [[1, 0], [0, 1], [0, 0]], atol=1e-6)


def test_jacobian_scaled():
    # UV scaled by 0.5 -> derivatives double
    p0 = jnp.asarray([0.0, 0.0, 0.0])
    p1 = jnp.asarray([2.0, 0.0, 0.0])
    p2 = jnp.asarray([0.0, 3.0, 0.0])
    J = np.asarray(
        TP.uv3d_jacobian(
            p0, p1, p2,
            jnp.asarray([0.0, 0.0]), jnp.asarray([0.5, 0.0]), jnp.asarray([0.0, 0.5]),
        )
    )
    np.testing.assert_allclose(J, [[4, 0], [0, 6], [0, 0]], atol=1e-5)


def test_triangle_frame_longest_edge():
    # |v2-v1| = sqrt(26) is the longest edge -> edge1 = normalize(v2 - v1)
    v0 = jnp.asarray([[0.0, 0.0, 0.0]])
    v1 = jnp.asarray([[1.0, 0.0, 0.0]])
    v2 = jnp.asarray([[0.0, 5.0, 0.0]])
    e1, n = TP.triangle_frame(v0, v1, v2)
    s26 = np.sqrt(26.0)
    np.testing.assert_allclose(np.asarray(e1)[0], [-1 / s26, 5 / s26, 0], atol=1e-6)
    # edge2 stays v2-v0 -> n = cross(e3_hat, e2) direction = -z
    np.testing.assert_allclose(np.asarray(n)[0], [0, 0, -1], atol=1e-6)

    # e2 = v2-v0 strictly longest (obtuse layout): swap2 path
    v2b = jnp.asarray([[0.9, 5.0, 0.0]])
    e1b, nb = TP.triangle_frame(v0, v1, v2b)
    exp = np.array([0.9, 5.0, 0.0]) / np.linalg.norm([0.9, 5.0, 0.0])
    np.testing.assert_allclose(np.asarray(e1b)[0], exp, atol=1e-6)
    # edge2 becomes original e1=(1,0,0): n = cross(e2_hat, e1) ~ -z
    np.testing.assert_allclose(np.asarray(nb)[0], [0, 0, -1], atol=1e-6)


def test_conversion_attrs_quad():
    # unit right triangle in z=0; frame z-axis must equal the geometric normal
    tri = jnp.asarray([[[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    out = TP.triangle_conversion_attrs(
        tri, jnp.asarray([0.0, 0.0, 0.0]), jnp.asarray([1.0, 1.0, 0.0])
    )
    R = np.asarray(quat_to_mat(out["quat"]))[0]
    n = np.asarray(out["normal_geo"])[0]
    np.testing.assert_allclose(R[:, 2], n, atol=1e-5)  # z column = normal
    # hypotenuse is the longest edge; x column = normalize(v2-v1) = (-1,1,0)/sqrt2
    s = 1 / np.sqrt(2)
    np.testing.assert_allclose(np.abs(R[:, 0]), [s, s, 0], atol=1e-5)
    # identity UV mapping -> scale = (1, 1, 1e-7)
    np.testing.assert_allclose(np.asarray(out["scale"])[0], [1, 1, 1e-7], atol=1e-5)


def test_uv_unwrap_charts_disjoint_and_convert():
    """uv_unwrap gives every face a disjoint [0,1]^2 chart; conversion on the
    unwrapped atlas emits non-overlapping coverage (exactly one splat per
    covered texel — replicating what the reference's disabled xatlas path
    would feed the converter, normalizedUvUnwrapping.cpp:138-316)."""
    import numpy as np
    import jax.numpy as jnp

    from mesh2splat_tpu.ops.uv_unwrap import unwrap_normalized_uvs
    from mesh2splat_tpu.ops.conversion import ConversionConfig, convert
    from mesh2splat_tpu.types import Material, TriangleMesh

    rng = np.random.default_rng(5)
    t = 30
    tri_pos = rng.uniform(0, 1, (t, 3, 3)).astype(np.float32)
    uv = unwrap_normalized_uvs(tri_pos)
    assert uv.shape == (t, 3, 2)
    assert uv.min() >= 0.0 and uv.max() <= 1.0 + 1e-6

    # rasterize charts on a fine grid: no texel claimed by two triangles
    res = 256
    ii, jj = np.meshgrid(np.arange(res), np.arange(res), indexing="ij")
    centers = (np.stack([jj, ii], -1).reshape(-1, 2) + 0.5) / res

    def inside(tri_uv, p):
        a, b, c = tri_uv
        d = (b[0]-a[0])*(c[1]-a[1]) - (c[0]-a[0])*(b[1]-a[1])
        if abs(d) < 1e-12:
            return np.zeros(len(p), bool)
        wb = ((p[:,0]-a[0])*(c[1]-a[1]) - (c[0]-a[0])*(p[:,1]-a[1])) / d
        wc = ((b[0]-a[0])*(p[:,1]-a[1]) - (p[:,0]-a[0])*(b[1]-a[1])) / d
        wa = 1 - wb - wc
        return (wa > 1e-6) & (wb > 1e-6) & (wc > 1e-6)

    hits = np.zeros(res * res, np.int32)
    for k in range(t):
        hits += inside(uv[k], centers).astype(np.int32)
    assert hits.max() <= 1, "overlapping charts"
    assert hits.sum() > 50  # charts actually cover something

    mesh = TriangleMesh(
        tri_pos=jnp.asarray(tri_pos),
        tri_normal=jnp.asarray(
            np.broadcast_to([0, 0, 1.0], (t, 3, 3)).copy().astype(np.float32)),
        tri_tangent=jnp.asarray(
            np.broadcast_to([1, 0, 0, 1.0], (t, 3, 4)).copy().astype(np.float32)),
        tri_uv=jnp.asarray(tri_pos[..., :2]),
    )
    lo, hi = mesh.bbox()
    cfg = ConversionConfig(resolution=64, layers=4)
    sp = convert(mesh, Material.default(), lo, hi, cfg,
                 ortho_uv=jnp.asarray(uv))
    n = int(sp.count())
    assert n > 0
    # no texel double-claimed => splat count <= res^2
    assert n <= 64 * 64
