"""Golden-file PLY I/O tests (SURVEY.md section 4 test item 2): byte-layout
checks against the reference's writer structure and round-trip invariants."""

import io
import struct

import numpy as np
import pytest

from mesh2splat_tpu.io import ply


def make_arrays(n=17, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "pos": rng.normal(size=(n, 3)).astype(np.float32),
        "color": rng.uniform(0.05, 0.95, size=(n, 4)).astype(np.float32),
        "scale": rng.uniform(0.01, 1.0, size=(n, 3)).astype(np.float32),
        "normal": (lambda v: v / np.linalg.norm(v, axis=-1, keepdims=True))(
            rng.normal(size=(n, 3))
        ).astype(np.float32),
        "quat": (lambda v: v / np.linalg.norm(v, axis=-1, keepdims=True))(
            rng.normal(size=(n, 4))
        ).astype(np.float32),
        "pbr": rng.uniform(0, 1, size=(n, 2)).astype(np.float32),
    }


def test_standard_header_and_size():
    arrs = make_arrays(5)
    data = ply.write_ply_standard(arrs, 1.0)
    head, _, body = data.partition(b"end_header\n")
    assert b"element vertex 5" in head
    assert head.count(b"property float") == 62
    assert b"f_rest_44" in head
    assert len(body) == 5 * 62 * 4  # 248 B per splat, like the reference


def test_pbr_header_and_size():
    arrs = make_arrays(7)
    data = ply.write_ply_pbr(arrs, 1.0)
    head, _, body = data.partition(b"end_header\n")
    assert b"property float metallicFactor" in head
    assert b"property float roughnessFactor" in head
    assert len(body) == 7 * 19 * 4


def test_compressed_size():
    arrs = make_arrays(11)
    data = ply.write_ply_compressed(arrs, 1.0)
    head, _, body = data.partition(b"end_header\n")
    # 3*4 + 4 + 4*4 + 3*4 + 2 + 2 = 48 B per vertex
    assert len(body) == 11 * 48


def test_standard_field_encoding():
    """First vertex bytes must follow parsers.cpp:469-511 exactly."""
    arrs = make_arrays(3)
    mult = 0.125
    data = ply.write_ply_standard(arrs, mult)
    body = data.partition(b"end_header\n")[2]
    v0 = np.frombuffer(body[: 62 * 4], dtype="<f4")
    np.testing.assert_allclose(v0[0:3], arrs["pos"][0], rtol=1e-6)
    np.testing.assert_allclose(v0[3:6], arrs["normal"][0], rtol=1e-6)
    np.testing.assert_allclose(
        v0[6:9], (arrs["color"][0, :3] - 0.5) / ply.SH_C0, rtol=1e-5
    )
    assert np.all(v0[9:54] == 0.0)  # f_rest zeros
    a = arrs["color"][0, 3]
    np.testing.assert_allclose(
        v0[54], -np.log(1.0 / (a + 1e-8) - 1.0), rtol=1e-5
    )
    np.testing.assert_allclose(v0[55:58], np.log(arrs["scale"][0] * mult), rtol=1e-5)
    np.testing.assert_allclose(v0[58:62], arrs["quat"][0], rtol=1e-6)


def test_roundtrip_standard(tmp_path):
    arrs = make_arrays(23)
    mult = 0.5
    p = tmp_path / "s.ply"
    ply.write_ply(p, arrs, fmt=0, scale_multiplier=mult)
    out, has_pbr = ply.read_ply(p)
    assert not has_pbr  # standard format has no metallic/roughness
    np.testing.assert_allclose(out["pos"], arrs["pos"], atol=1e-6)
    np.testing.assert_allclose(out["color"][:, :3], arrs["color"][:, :3], atol=1e-5)
    np.testing.assert_allclose(out["color"][:, 3], arrs["color"][:, 3], atol=1e-5)
    np.testing.assert_allclose(out["scale"], arrs["scale"] * mult, rtol=1e-4)
    # quat sign-insensitive
    dot = np.abs(np.sum(out["quat"] * arrs["quat"], axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-5)


def test_roundtrip_pbr(tmp_path):
    arrs = make_arrays(13)
    p = tmp_path / "p.ply"
    ply.write_ply(p, arrs, fmt=1, scale_multiplier=1.0)
    out, has_pbr = ply.read_ply(p)
    assert has_pbr
    np.testing.assert_allclose(out["pbr"], arrs["pbr"], atol=1e-6)
    np.testing.assert_allclose(out["normal"], arrs["normal"], atol=1e-6)
    np.testing.assert_allclose(out["scale"], arrs["scale"], rtol=1e-4)


def test_roundtrip_compressed(tmp_path):
    arrs = make_arrays(9)
    p = tmp_path / "c.ply"
    ply.write_ply(p, arrs, fmt=2, scale_multiplier=1.0)
    out, has_pbr = ply.read_ply(p)
    assert has_pbr
    np.testing.assert_allclose(out["pos"], arrs["pos"], atol=1e-6)
    np.testing.assert_allclose(out["color"], arrs["color"], atol=1.0 / 255.0)
    np.testing.assert_allclose(out["pbr"], arrs["pbr"], atol=1.0 / 255.0)
    # octahedral round trip: direction preserved to u8 precision
    cos = np.sum(out["normal"] * arrs["normal"], axis=-1)
    assert np.all(cos > 0.99)
    np.testing.assert_allclose(out["scale"][:, :2], arrs["scale"][:, :2], rtol=1e-4)
    np.testing.assert_allclose(
        out["scale"][:, 2], np.minimum(arrs["scale"][:, 0], arrs["scale"][:, 1]),
        rtol=1e-4,
    )


def test_splats_pytree_roundtrip(tmp_path):
    from mesh2splat_tpu.types import Splats

    arrs = make_arrays(6)
    sp = ply.arrays_to_splats(arrs, capacity=10)
    assert sp.capacity == 10
    assert int(sp.count()) == 6
    back = ply.splats_to_arrays(sp)
    np.testing.assert_allclose(back["pos"], arrs["pos"], atol=1e-6)


def _ascii_ply_from(arrs, scale_multiplier=1.0):
    """Build an ASCII PLY with the PBR (format 1) property set."""
    data = ply.write_ply_pbr(arrs, scale_multiplier)
    head, _, body = data.partition(b"end_header\n")
    n = arrs["pos"].shape[0]
    rec = np.frombuffer(body, dtype="<f4").reshape(n, 19)
    lines = ["ply", "format ascii 1.0", f"element vertex {n}"]
    lines += [p for p in head.decode().splitlines() if p.startswith("property")]
    lines.append("end_header")
    for row in rec:
        lines.append(" ".join(repr(float(v)) for v in row))
    return ("\n".join(lines) + "\n").encode()


def test_read_ascii_ply(tmp_path):
    """happly parity: the reference loads ascii PLYs too (parsers.cpp:519)."""
    arrs = make_arrays(21)
    p = tmp_path / "a.ply"
    p.write_bytes(_ascii_ply_from(arrs, scale_multiplier=0.25))
    out, has_pbr = ply.read_ply(p)
    assert has_pbr
    np.testing.assert_allclose(out["pos"], arrs["pos"], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(out["scale"], arrs["scale"] * 0.25, rtol=1e-4)
    np.testing.assert_allclose(out["color"], arrs["color"], rtol=1e-4, atol=1e-5)


def test_read_filters_nonfinite(tmp_path):
    """shouldSkip parity (reference: utils.cpp:386-402): NaN/Inf and all-zero
    splats are dropped at import."""
    arrs = make_arrays(10)
    arrs["pos"][3, 1] = np.nan
    arrs["quat"][7, 0] = np.inf
    p = tmp_path / "n.ply"
    ply.write_ply(p, arrs, fmt=1)
    out, _ = ply.read_ply(p)
    assert out["pos"].shape[0] == 8
    kept = [i for i in range(10) if i not in (3, 7)]
    np.testing.assert_allclose(out["pos"], arrs["pos"][kept], rtol=1e-6)
    # opt-out keeps everything
    out2, _ = ply.read_ply(p, filter_invalid=False)
    assert out2["pos"].shape[0] == 10


def test_read_ply_uses_native_fast_path(tmp_path):
    """decode_float_body is the production import path when the library is
    built (VERDICT r1 weak #7)."""
    from mesh2splat_tpu.io import native

    if not native.available():
        pytest.skip("native library unavailable")
    arrs = make_arrays(12)
    p = tmp_path / "f.ply"
    ply.write_ply(p, arrs, fmt=1)
    called = {}
    orig = native.decode_float_body

    def spy(*a, **k):
        called["yes"] = True
        return orig(*a, **k)

    native.decode_float_body, _saved = spy, orig
    try:
        out, has_pbr = ply.read_ply(p)
    finally:
        native.decode_float_body = _saved
    assert called.get("yes")
    assert has_pbr
    np.testing.assert_allclose(out["pos"], arrs["pos"], rtol=1e-6)
