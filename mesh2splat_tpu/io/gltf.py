"""Minimal pure-numpy GLB (binary glTF 2.0) loader + writer.

Host-side replacement for the reference's tiny_gltf-based SceneManager
(reference: src/utils/SceneManager.cpp:195-459 ``parseGltfFile``). Semantics
replicated exactly:

  * scene-graph traversal with per-node matrix or T*R*S transforms, default
    scene, orphan-mesh fallback                         (SceneManager.cpp:219-282)
  * world-space position bake; normals via the normal matrix
    transpose(inverse(M))                               (:290, :397-400)
  * flat-face normal fallback when NORMAL is absent     (:406-413)
  * per-face UV-derived tangent fallback when TANGENT is absent, with the
    det<1e-8 -> 1 guard and handedness sign             (:424-451)
  * u8/u16/u32 indices; non-indexed sequential fallback (:312-348)
  * per-primitive material: baseColorFactor + baseColor/normal/
    metallicRoughness textures, decoded and downscaled to <= 2048 px
    (reference: params.hpp:10, parsers.cpp:38-48)

The writer emits small single-buffer GLBs for test fixtures and round-trip
tests (the reference has no writer; ours makes golden tests self-contained).
"""

from __future__ import annotations

import dataclasses
import io
import json
import struct

import numpy as np

MAX_TEXTURE_DIM = 2048  # params.hpp:10 MAX_RESOLUTION_TARGET

_COMPONENT_DTYPES = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16,
    5123: np.uint16, 5125: np.uint32, 5126: np.float32,
}
_TYPE_COUNTS = {
    "SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4,
    "MAT2": 4, "MAT3": 9, "MAT4": 16,
}


@dataclasses.dataclass
class GltfPrimitive:
    """One primitive baked to world space (triangle soup + material)."""

    name: str
    tri_pos: np.ndarray      # (T, 3, 3) f32
    tri_normal: np.ndarray   # (T, 3, 3) f32
    tri_tangent: np.ndarray  # (T, 3, 4) f32
    tri_uv: np.ndarray       # (T, 3, 2) f32
    base_color_factor: np.ndarray   # (4,) f32
    metallic_factor: float
    roughness_factor: float
    base_color_tex: np.ndarray | None        # (H, W, 4) f32 in [0,1]
    normal_tex: np.ndarray | None            # (H, W, 3) f32
    metallic_roughness_tex: np.ndarray | None  # (H, W, 3) f32

    @property
    def num_triangles(self):
        return self.tri_pos.shape[0]

    def bbox(self):
        flat = self.tri_pos.reshape(-1, 3)
        return flat.min(axis=0), flat.max(axis=0)


def _read_glb_chunks(data: bytes):
    magic, version, _length = struct.unpack_from("<III", data, 0)
    if magic != 0x46546C67:  # 'glTF'
        raise ValueError("not a GLB file")
    if version != 2:
        raise ValueError(f"unsupported glTF version {version}")
    off = 12
    gltf_json = None
    bin_chunk = b""
    while off < len(data):
        clen, ctype = struct.unpack_from("<II", data, off)
        off += 8
        chunk = data[off : off + clen]
        off += clen
        if ctype == 0x4E4F534A:  # 'JSON'
            gltf_json = json.loads(chunk.decode("utf-8"))
        elif ctype == 0x004E4942:  # 'BIN\0'
            bin_chunk = chunk
    if gltf_json is None:
        raise ValueError("GLB missing JSON chunk")
    return gltf_json, bin_chunk


def _accessor_data(gltf, binary, accessor_index) -> np.ndarray:
    acc = gltf["accessors"][accessor_index]
    dtype = _COMPONENT_DTYPES[acc["componentType"]]
    ncomp = _TYPE_COUNTS[acc["type"]]
    count = acc["count"]
    itemsize = np.dtype(dtype).itemsize * ncomp

    view = gltf["bufferViews"][acc["bufferView"]]
    base = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    stride = view.get("byteStride", 0) or itemsize

    if stride == itemsize:
        out = np.frombuffer(binary, dtype=dtype, count=count * ncomp, offset=base)
        out = out.reshape(count, ncomp)
    else:
        rows = np.empty((count, ncomp), dtype)
        for i in range(count):
            rows[i] = np.frombuffer(binary, dtype=dtype, count=ncomp,
                                    offset=base + i * stride)
        out = rows
    if acc.get("normalized") and dtype != np.float32:
        out = out.astype(np.float32) / np.iinfo(dtype).max
    return np.ascontiguousarray(out)


def _accessor_floats(gltf, binary, accessor_index) -> np.ndarray:
    """Float32 accessor decode; native C++ fast path (csrc/glb_decode.cpp)
    with the pure-numpy _accessor_data fallback."""
    from . import native

    acc = gltf["accessors"][accessor_index]
    if "sparse" not in acc and "bufferView" in acc:
        dtype = _COMPONENT_DTYPES[acc["componentType"]]
        ncomp = _TYPE_COUNTS[acc["type"]]
        itemsize = np.dtype(dtype).itemsize * ncomp
        view = gltf["bufferViews"][acc["bufferView"]]
        base = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
        stride = view.get("byteStride", 0) or itemsize
        out = native.accessor_decode(
            bytes(binary[base:base + stride * acc["count"]]),
            acc["count"], ncomp, acc["componentType"], stride,
            bool(acc.get("normalized")),
        )
        if out is not None:
            return out
    return _accessor_data(gltf, binary, accessor_index).astype(np.float32)


def _node_local_transform(node) -> np.ndarray:
    if "matrix" in node:
        # glTF matrices are column-major (SceneManager.cpp:226-230)
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = m @ np.diag(list(node["scale"]) + [1.0]).astype(np.float32)
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        R = np.eye(4, dtype=np.float32)
        R[:3, :3] = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ], np.float32)
        m = R @ m
    if "translation" in node:
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = node["translation"]
        m = t @ m
    return m


def _decode_image(gltf, binary, image_index, mode="RGBA") -> np.ndarray:
    from PIL import Image

    img_def = gltf["images"][image_index]
    if "bufferView" in img_def:
        view = gltf["bufferViews"][img_def["bufferView"]]
        base = view.get("byteOffset", 0)
        blob = binary[base : base + view["byteLength"]]
    elif "uri" in img_def and img_def["uri"].startswith("data:"):
        import base64

        blob = base64.b64decode(img_def["uri"].split(",", 1)[1])
    else:
        raise ValueError("external image URIs not supported in GLB loader")
    img = Image.open(io.BytesIO(blob)).convert(mode)
    # downscale cap (params.hpp:10; parsers.cpp:38-48)
    if max(img.size) > MAX_TEXTURE_DIM:
        scale = MAX_TEXTURE_DIM / max(img.size)
        img = img.resize(
            (max(1, int(img.width * scale)), max(1, int(img.height * scale)))
        )
    return np.asarray(img, np.float32) / 255.0


def _texture_image(gltf, binary, tex_info, mode):
    if tex_info is None:
        return None
    tex = gltf["textures"][tex_info["index"]]
    if "source" not in tex:
        return None
    return _decode_image(gltf, binary, tex["source"], mode)


def load_glb(path_or_bytes) -> list[GltfPrimitive]:
    """Load a .glb into world-space primitives (SceneManager.cpp:195-459)."""
    if isinstance(path_or_bytes, (bytes, bytearray)):
        data = bytes(path_or_bytes)
    else:
        with open(path_or_bytes, "rb") as f:
            data = f.read()
    gltf, binary = _read_glb_chunks(data)

    # collect (mesh_index, world_transform) via scene traversal
    instances: list[tuple[int, np.ndarray]] = []
    nodes = gltf.get("nodes", [])

    def traverse(node_index, parent):
        if not (0 <= node_index < len(nodes)):
            return
        node = nodes[node_index]
        world = parent @ _node_local_transform(node)
        if "mesh" in node:
            instances.append((node["mesh"], world))
        for child in node.get("children", []):
            traverse(child, world)

    scenes = gltf.get("scenes", [])
    if scenes:
        scene = scenes[gltf.get("scene", 0)]
        for root in scene.get("nodes", []):
            traverse(root, np.eye(4, dtype=np.float32))
    if not instances:  # orphan fallback (SceneManager.cpp:278-282)
        instances = [
            (i, np.eye(4, dtype=np.float32))
            for i in range(len(gltf.get("meshes", [])))
        ]

    primitives: list[GltfPrimitive] = []
    counter = 0
    for mesh_index, world in instances:
        mesh = gltf["meshes"][mesh_index]

        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:  # TRIANGLES only (:294-297)
                continue
            attrs = prim.get("attributes", {})
            if "POSITION" not in attrs:
                continue

            pos = _accessor_floats(gltf, binary, attrs["POSITION"])
            if "indices" in prim:
                idx = _accessor_data(gltf, binary, prim["indices"]).reshape(-1)
                idx = idx.astype(np.uint32)
            else:
                idx = np.arange(pos.shape[0], dtype=np.uint32)
            if idx.size < 3 or idx.size % 3 != 0:
                continue
            tri_idx = idx.reshape(-1, 3)

            nrm = (
                _accessor_floats(gltf, binary, attrs["NORMAL"])
                if "NORMAL" in attrs else None
            )
            uv = (
                _accessor_floats(gltf, binary, attrs["TEXCOORD_0"])
                if "TEXCOORD_0" in attrs else None
            )
            tan = (
                _accessor_floats(gltf, binary, attrs["TANGENT"])
                if "TANGENT" in attrs else None
            )

            normal_matrix = np.linalg.inv(world[:3, :3]).T

            from . import native

            assembled = native.assemble_triangles(
                pos, nrm, uv, tan, tri_idx.reshape(-1), world, normal_matrix
            )
            if assembled is not None:
                tri_pos, tri_normal, tri_uv, tri_tangent = assembled
            else:
                # pure-numpy fallback (same math as csrc/glb_decode.cpp)
                world_pos = pos @ world[:3, :3].T + world[:3, 3]
                tri_pos = world_pos[tri_idx]

                if nrm is not None:
                    nrm_w = nrm @ normal_matrix.T
                    nrm_w /= np.linalg.norm(nrm_w, axis=-1, keepdims=True) + 1e-12
                    tri_normal = nrm_w[tri_idx]
                else:
                    # flat fallback (:406-413)
                    fn = np.cross(
                        tri_pos[:, 1] - tri_pos[:, 0], tri_pos[:, 2] - tri_pos[:, 0]
                    )
                    fn /= np.linalg.norm(fn, axis=-1, keepdims=True) + 1e-12
                    tri_normal = np.repeat(fn[:, None, :], 3, axis=1)

                if uv is not None:
                    tri_uv = uv[tri_idx]
                else:
                    tri_uv = np.zeros((tri_idx.shape[0], 3, 2), np.float32)

                if tan is not None:
                    t_w = tan[:, :3] @ world[:3, :3].T
                    t_w /= np.linalg.norm(t_w, axis=-1, keepdims=True) + 1e-12
                    tan_w = np.concatenate([t_w, tan[:, 3:4]], axis=-1)
                    tri_tangent = tan_w[tri_idx]
                else:
                    # per-face UV-derived fallback (:424-451)
                    dp1 = tri_pos[:, 1] - tri_pos[:, 0]
                    dp2 = tri_pos[:, 2] - tri_pos[:, 0]
                    duv1 = tri_uv[:, 1] - tri_uv[:, 0]
                    duv2 = tri_uv[:, 2] - tri_uv[:, 0]
                    det = duv1[:, 0] * duv2[:, 1] - duv1[:, 1] * duv2[:, 0]
                    det = np.where(np.abs(det) < 1e-8, 1.0, det)
                    inv = (1.0 / det)[:, None]
                    tangent = (dp1 * duv2[:, 1:2] - dp2 * duv1[:, 1:2]) * inv
                    bitangent = (dp2 * duv1[:, 0:1] - dp1 * duv2[:, 0:1]) * inv
                    tangent /= np.linalg.norm(tangent, axis=-1, keepdims=True) + 1e-12
                    bitangent /= np.linalg.norm(bitangent, axis=-1, keepdims=True) + 1e-12
                    fn = np.cross(dp1, dp2)
                    fn /= np.linalg.norm(fn, axis=-1, keepdims=True) + 1e-12
                    handed = np.where(
                        np.sum(np.cross(fn, tangent) * bitangent, axis=-1) < 0, -1.0, 1.0
                    )
                    face_tan = np.concatenate([tangent, handed[:, None]], axis=-1)
                    tri_tangent = np.repeat(face_tan[:, None, :], 3, axis=1).astype(np.float32)

            # material (SceneManager.cpp parseGltfMaterial + ConversionPass bindings)
            mat_idx = prim.get("material", -1)
            bcf = np.ones(4, np.float32)
            metallic_f, roughness_f = 1.0, 1.0
            base_tex = normal_tex = mr_tex = None
            if 0 <= mat_idx < len(gltf.get("materials", [])):
                mat = gltf["materials"][mat_idx]
                pbr = mat.get("pbrMetallicRoughness", {})
                bcf = np.asarray(
                    pbr.get("baseColorFactor", [1, 1, 1, 1]), np.float32
                )
                metallic_f = float(pbr.get("metallicFactor", 1.0))
                roughness_f = float(pbr.get("roughnessFactor", 1.0))
                base_tex = _texture_image(
                    gltf, binary, pbr.get("baseColorTexture"), "RGBA"
                )
                mr_tex = _texture_image(
                    gltf, binary, pbr.get("metallicRoughnessTexture"), "RGB"
                )
                normal_tex = _texture_image(
                    gltf, binary, mat.get("normalTexture"), "RGB"
                )

            name = mesh.get("name", "mesh")
            primitives.append(
                GltfPrimitive(
                    name=f"{name}_{counter}",
                    tri_pos=np.ascontiguousarray(tri_pos, np.float32),
                    tri_normal=np.ascontiguousarray(tri_normal, np.float32),
                    tri_tangent=np.ascontiguousarray(tri_tangent, np.float32),
                    tri_uv=np.ascontiguousarray(tri_uv, np.float32),
                    base_color_factor=bcf,
                    metallic_factor=metallic_f,
                    roughness_factor=roughness_f,
                    base_color_tex=base_tex,
                    normal_tex=normal_tex,
                    metallic_roughness_tex=mr_tex,
                )
            )
            counter += 1
    return primitives


def to_device(prim: GltfPrimitive):
    """GltfPrimitive -> (TriangleMesh, Material) device pytrees."""
    import jax.numpy as jnp

    from ..types import Material, TriangleMesh

    mesh = TriangleMesh(
        tri_pos=jnp.asarray(prim.tri_pos),
        tri_normal=jnp.asarray(prim.tri_normal),
        tri_tangent=jnp.asarray(prim.tri_tangent),
        tri_uv=jnp.asarray(prim.tri_uv),
    )
    d = Material.default()
    mat = Material(
        base_color_factor=jnp.asarray(prim.base_color_factor),
        metallic_factor=jnp.float32(prim.metallic_factor),
        roughness_factor=jnp.float32(prim.roughness_factor),
        base_color=(
            jnp.asarray(prim.base_color_tex)
            if prim.base_color_tex is not None else d.base_color
        ),
        normal=(
            jnp.asarray(prim.normal_tex)
            if prim.normal_tex is not None else d.normal
        ),
        metallic_roughness=(
            jnp.asarray(prim.metallic_roughness_tex)
            if prim.metallic_roughness_tex is not None else d.metallic_roughness
        ),
        has_base_color=prim.base_color_tex is not None,
        has_normal=prim.normal_tex is not None,
        has_metallic_roughness=prim.metallic_roughness_tex is not None,
    )
    return mesh, mat


# ----------------------------------------------------------------------------
# Writer (test fixtures)
# ----------------------------------------------------------------------------

def write_glb(
    path,
    positions: np.ndarray,          # (V, 3) f32
    indices: np.ndarray,            # (T, 3) u32
    normals: np.ndarray | None = None,
    uvs: np.ndarray | None = None,
    tangents: np.ndarray | None = None,
    base_color_png: bytes | None = None,
    base_color_factor=(1, 1, 1, 1),
    metallic_factor=1.0,
    roughness_factor=1.0,
    node_matrix: np.ndarray | None = None,
):
    """Write a minimal single-primitive GLB."""
    buffers = []
    views = []
    accessors = []

    def add_blob(arr_bytes, target=None):
        off = sum(len(b) for b in buffers)
        pad = (-off) % 4
        if pad:
            buffers.append(b"\0" * pad)
            off += pad
        buffers.append(arr_bytes)
        view = {"buffer": 0, "byteOffset": off, "byteLength": len(arr_bytes)}
        if target:
            view["target"] = target
        views.append(view)
        return len(views) - 1

    def add_accessor(arr, type_str, component=5126, target=34962, minmax=False):
        vidx = add_blob(np.ascontiguousarray(arr).tobytes(), target)
        acc = {
            "bufferView": vidx,
            "componentType": component,
            "count": arr.shape[0],
            "type": type_str,
        }
        if minmax:
            acc["min"] = arr.min(axis=0).tolist()
            acc["max"] = arr.max(axis=0).tolist()
        accessors.append(acc)
        return len(accessors) - 1

    positions = np.asarray(positions, np.float32)
    attrs = {"POSITION": add_accessor(positions, "VEC3", minmax=True)}
    if normals is not None:
        attrs["NORMAL"] = add_accessor(np.asarray(normals, np.float32), "VEC3")
    if uvs is not None:
        attrs["TEXCOORD_0"] = add_accessor(np.asarray(uvs, np.float32), "VEC2")
    if tangents is not None:
        attrs["TANGENT"] = add_accessor(np.asarray(tangents, np.float32), "VEC4")
    idx_acc = add_accessor(
        np.asarray(indices, np.uint32).reshape(-1, 1), "SCALAR",
        component=5125, target=34963,
    )

    material = {
        "pbrMetallicRoughness": {
            "baseColorFactor": list(map(float, base_color_factor)),
            "metallicFactor": float(metallic_factor),
            "roughnessFactor": float(roughness_factor),
        }
    }
    gltf = {
        "asset": {"version": "2.0", "generator": "mesh2splat_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [{"mesh": 0}],
        "meshes": [
            {"name": "mesh", "primitives": [
                {"attributes": attrs, "indices": idx_acc, "mode": 4, "material": 0}
            ]}
        ],
        "materials": [material],
    }
    if node_matrix is not None:
        gltf["nodes"][0]["matrix"] = (
            np.asarray(node_matrix, np.float32).T.reshape(-1).tolist()
        )
    if base_color_png is not None:
        img_view = add_blob(base_color_png)
        gltf["images"] = [{"bufferView": img_view, "mimeType": "image/png"}]
        gltf["samplers"] = [{}]
        gltf["textures"] = [{"source": 0, "sampler": 0}]
        material["pbrMetallicRoughness"]["baseColorTexture"] = {"index": 0}

    binary = b"".join(buffers)
    binary += b"\0" * ((-len(binary)) % 4)
    gltf["buffers"] = [{"byteLength": len(binary)}]
    gltf["bufferViews"] = views
    gltf["accessors"] = accessors

    js = json.dumps(gltf, separators=(",", ":")).encode("utf-8")
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(binary)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(binary), 0x004E4942) + binary
    if hasattr(path, "write"):
        path.write(out)
    else:
        with open(path, "wb") as f:
            f.write(out)
    return total


def write_glb_multi(path, primitives: list[dict], node_trs: list[dict] | None = None):
    """Write a multi-primitive GLB with full PBR materials and a node
    hierarchy — a production-shaped asset (SciFiHelmet-like: several
    primitives, baseColor + normal + metallicRoughness textures, TRS nodes;
    reference ingest path: SceneManager.cpp:195-459).

    primitives: list of dicts with keys
      positions (V,3) f32, indices (T,3) u32, normals (V,3), uvs (V,2),
      tangents (V,4) [optional], base_color_png / normal_png /
      metallic_roughness_png (bytes, optional), base_color_factor (4,),
      metallic_factor, roughness_factor.
    node_trs: per-primitive dicts with optional translation/rotation/scale
      lists (glTF TRS order); each primitive gets its own child node under a
      root node, exercising the scene-graph transform bake.
    """
    buffers = []
    views = []
    accessors = []

    def add_blob(arr_bytes, target=None):
        off = sum(len(b) for b in buffers)
        pad = (-off) % 4
        if pad:
            buffers.append(b"\0" * pad)
            off += pad
        buffers.append(arr_bytes)
        view = {"buffer": 0, "byteOffset": off, "byteLength": len(arr_bytes)}
        if target:
            view["target"] = target
        views.append(view)
        return len(views) - 1

    def add_accessor(arr, type_str, component=5126, target=34962, minmax=False):
        vidx = add_blob(np.ascontiguousarray(arr).tobytes(), target)
        acc = {
            "bufferView": vidx,
            "componentType": component,
            "count": arr.shape[0],
            "type": type_str,
        }
        if minmax:
            acc["min"] = arr.min(axis=0).tolist()
            acc["max"] = arr.max(axis=0).tolist()
        accessors.append(acc)
        return len(accessors) - 1

    images = []
    textures = []
    materials = []
    meshes = []
    child_nodes = []

    def add_texture(png_bytes):
        img_view = add_blob(png_bytes)
        images.append({"bufferView": img_view, "mimeType": "image/png"})
        textures.append({"source": len(images) - 1, "sampler": 0})
        return len(textures) - 1

    for pi, prim in enumerate(primitives):
        attrs = {
            "POSITION": add_accessor(
                np.asarray(prim["positions"], np.float32), "VEC3", minmax=True
            ),
            "NORMAL": add_accessor(
                np.asarray(prim["normals"], np.float32), "VEC3"
            ),
            "TEXCOORD_0": add_accessor(
                np.asarray(prim["uvs"], np.float32), "VEC2"
            ),
        }
        if prim.get("tangents") is not None:
            attrs["TANGENT"] = add_accessor(
                np.asarray(prim["tangents"], np.float32), "VEC4"
            )
        idx_acc = add_accessor(
            np.asarray(prim["indices"], np.uint32).reshape(-1, 1), "SCALAR",
            component=5125, target=34963,
        )
        mat = {
            "pbrMetallicRoughness": {
                "baseColorFactor": list(
                    map(float, prim.get("base_color_factor", (1, 1, 1, 1)))
                ),
                "metallicFactor": float(prim.get("metallic_factor", 1.0)),
                "roughnessFactor": float(prim.get("roughness_factor", 1.0)),
            }
        }
        if prim.get("base_color_png") is not None:
            mat["pbrMetallicRoughness"]["baseColorTexture"] = {
                "index": add_texture(prim["base_color_png"])
            }
        if prim.get("metallic_roughness_png") is not None:
            mat["pbrMetallicRoughness"]["metallicRoughnessTexture"] = {
                "index": add_texture(prim["metallic_roughness_png"])
            }
        if prim.get("normal_png") is not None:
            mat["normalTexture"] = {"index": add_texture(prim["normal_png"])}
        materials.append(mat)
        meshes.append({
            "name": f"prim{pi}",
            "primitives": [{
                "attributes": attrs, "indices": idx_acc, "mode": 4,
                "material": len(materials) - 1,
            }],
        })
        node = {"mesh": pi, "name": f"node{pi}"}
        if node_trs and node_trs[pi]:
            node.update(node_trs[pi])
        child_nodes.append(node)

    gltf = {
        "asset": {"version": "2.0", "generator": "mesh2splat_tpu"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": (
            [{"name": "root", "children": list(range(1, len(child_nodes) + 1))}]
            + child_nodes
        ),
        "meshes": meshes,
        "materials": materials,
    }
    if images:
        gltf["images"] = images
        gltf["textures"] = textures
        gltf["samplers"] = [{}]

    binary = b"".join(buffers)
    binary += b"\0" * ((-len(binary)) % 4)
    gltf["buffers"] = [{"byteLength": len(binary)}]
    gltf["bufferViews"] = views
    gltf["accessors"] = accessors

    js = json.dumps(gltf, separators=(",", ":")).encode("utf-8")
    js += b" " * ((-len(js)) % 4)
    total = 12 + 8 + len(js) + 8 + len(binary)
    out = struct.pack("<III", 0x46546C67, 2, total)
    out += struct.pack("<II", len(js), 0x4E4F534A) + js
    out += struct.pack("<II", len(binary), 0x004E4942) + binary
    if hasattr(path, "write"):
        path.write(out)
    else:
        with open(path, "wb") as f:
            f.write(out)
    return total
