"""ctypes bindings for the native runtime library (csrc/libm2s_native.so).

Auto-builds with make on first use (g++ is baked into the image); every entry
point has a pure-numpy fallback in io/ply.py, so the framework works without
a toolchain too.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

def _find_csrc() -> pathlib.Path:
    """Locate the native sources: M2S_NATIVE_DIR override, else csrc/
    shipped inside the package (both editable installs and wheels — the
    sources live at mesh2splat_tpu/csrc and ride along as package-data)."""
    import os

    env = os.environ.get("M2S_NATIVE_DIR")
    if env:
        return pathlib.Path(env)
    here = pathlib.Path(__file__).resolve()
    return here.parents[1] / "csrc"


_CSRC = _find_csrc()
_lib = None
_tried = False


def _src_tag() -> str:
    """Content hash of the C sources: keys the shared per-user cache so a
    reinstall/downgrade with different sources (and possibly a different
    C ABI) can never load a stale binary (mtime alone is unreliable —
    installers reset mtimes)."""
    import hashlib

    h = hashlib.sha256()
    for name in ("ply_codec.cpp", "glb_decode.cpp"):
        try:
            h.update((_CSRC / name).read_bytes())
        except OSError:
            pass
    return h.hexdigest()[:12]


def _lib_path() -> pathlib.Path:
    """Build target: next to the sources when that directory is writable
    (repo checkout / editable install), else a per-user cache dir keyed by
    source hash (wheel installed into a read-only site-packages)."""
    import os

    if os.access(_CSRC, os.W_OK):
        return _CSRC / "libm2s_native.so"
    cache = pathlib.Path(
        os.environ.get("XDG_CACHE_HOME", pathlib.Path.home() / ".cache")
    ) / "mesh2splat_tpu"
    cache.mkdir(parents=True, exist_ok=True)
    return cache / f"libm2s_native-{_src_tag()}.so"


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        srcs = [_CSRC / "ply_codec.cpp", _CSRC / "glb_decode.cpp"]
        lib_path = _lib_path()
        if not lib_path.exists() or any(
            lib_path.stat().st_mtime < s.stat().st_mtime for s in srcs
        ):
            subprocess.run(
                ["make", "-s", f"OUT={lib_path}"],
                cwd=_CSRC, check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(lib_path))
        lib.m2s_record_size.restype = ctypes.c_int
        lib.m2s_record_size.argtypes = [ctypes.c_int]
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.m2s_encode.restype = ctypes.c_longlong
        lib.m2s_encode.argtypes = [
            ctypes.c_int, ctypes.c_longlong, ctypes.c_float,
            f32p, f32p, f32p, f32p, f32p, f32p, u8p,
        ]
        lib.m2s_decode_float_body.restype = ctypes.c_longlong
        lib.m2s_decode_float_body.argtypes = [
            ctypes.c_longlong, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            f32p, f32p, f32p, f32p, f32p, f32p, f32p,
        ]
        u32p = np.ctypeslib.ndpointer(np.uint32, flags="C_CONTIGUOUS")
        lib.m2s_accessor_decode.restype = ctypes.c_int
        lib.m2s_accessor_decode.argtypes = [
            ctypes.c_char_p, ctypes.c_longlong, ctypes.c_int, ctypes.c_int,
            ctypes.c_longlong, ctypes.c_int, f32p,
        ]
        lib.m2s_assemble_triangles.restype = None
        lib.m2s_assemble_triangles.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            u32p, ctypes.c_longlong, f32p, f32p,
            f32p, f32p, f32p, f32p,
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def encode(fmt: int, arrs: dict, scale_multiplier: float) -> bytes | None:
    """Native body encode; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = arrs["pos"].shape[0]
    rec = lib.m2s_record_size(fmt)
    if rec < 0:
        return None
    out = np.empty(n * rec, np.uint8)
    c = lambda a: np.ascontiguousarray(a, np.float32)
    written = lib.m2s_encode(
        fmt, n, float(scale_multiplier),
        c(arrs["pos"]), c(arrs["color"]), c(arrs["scale"]),
        c(arrs["normal"]), c(arrs["quat"]), c(arrs["pbr"]), out,
    )
    if written != n * rec:
        return None
    return out.tobytes()


def decode_float_body(
    n: int, stride_floats: int, offsets: dict, body: np.ndarray
) -> dict | None:
    """Native decode of a float-only PLY body (formats 0/1 and generic
    3DGS). offsets: float offsets per field, -1 if absent."""
    lib = _load()
    if lib is None:
        return None
    pos = np.empty((n, 3), np.float32)
    color = np.empty((n, 4), np.float32)
    scale = np.empty((n, 3), np.float32)
    normal = np.empty((n, 3), np.float32)
    quat = np.empty((n, 4), np.float32)
    pbr = np.empty((n, 2), np.float32)
    lib.m2s_decode_float_body(
        n, stride_floats,
        offsets["xyz"], offsets.get("normal", -1), offsets["fdc"],
        offsets["opacity"], offsets["scale"], offsets["rot"],
        offsets.get("metal", -1), offsets.get("rough", -1),
        np.ascontiguousarray(body, np.float32),
        pos, color, scale, normal, quat, pbr,
    )
    return {
        "pos": pos, "color": color, "scale": scale,
        "normal": normal, "quat": quat, "pbr": pbr,
    }


def accessor_decode(raw: bytes, count: int, ncomp: int, component_type: int,
                    stride: int, normalized: bool) -> np.ndarray | None:
    """Native strided glTF accessor decode to float32; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((count, ncomp), np.float32)
    rc = lib.m2s_accessor_decode(
        raw, count, ncomp, component_type, stride, int(normalized), out
    )
    return out if rc == 0 else None


def assemble_triangles(pos, nrm, uv, tan, idx, world, normal_mat):
    """Native world-space triangle assembly with the reference's fallbacks;
    None if unavailable. Inputs are numpy float32/uint32 arrays (nrm/uv/tan
    may be None)."""
    lib = _load()
    if lib is None:
        return None
    f = int(idx.size // 3)
    tri_pos = np.empty((f, 3, 3), np.float32)
    tri_normal = np.empty((f, 3, 3), np.float32)
    tri_uv = np.empty((f, 3, 2), np.float32)
    tri_tangent = np.empty((f, 3, 4), np.float32)

    def ptr(a):
        if a is None:
            return None
        a = np.ascontiguousarray(a, np.float32)
        return a.ctypes.data_as(ctypes.c_void_p), a

    keep = []
    args = []
    for a in (pos, nrm, uv, tan):
        r = ptr(a)
        if r is None:
            args.append(None)
        else:
            args.append(r[0])
            keep.append(r[1])
    lib.m2s_assemble_triangles(
        args[0], args[1], args[2], args[3],
        np.ascontiguousarray(idx, np.uint32), f,
        np.ascontiguousarray(world, np.float32).reshape(-1),
        np.ascontiguousarray(normal_mat, np.float32).reshape(-1),
        tri_pos, tri_normal, tri_uv, tri_tangent,
    )
    return tri_pos, tri_normal, tri_uv, tri_tangent
