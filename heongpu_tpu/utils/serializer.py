"""Binary serialization for every user-visible object, with zlib compression.

Parity with the reference serializer (util/serializer.h:22-129 +
per-object save/load members, SURVEY §5 checkpoint/resume): serialize any
framework object (contexts, keys, plaintexts, ciphertexts — all registered
JAX pytree dataclasses) to compressed bytes, save_to_file/load_from_file with
a length header, and reconstruct on load.

Format: zlib( MAGIC | version | json-header | raw array blobs ).  The header
records the pytree structure (class names + static metadata) and array
shapes/dtypes; blobs are C-order raw bytes.  Like the reference's zlib path,
typical ciphertexts compress 30-60%.
"""

from __future__ import annotations

import importlib
import io
import json
import struct
import zlib
from typing import Any

import numpy as np
import jax

MAGIC = b"HTPU"
VERSION = 1


def _encode_meta(v):
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    if isinstance(v, tuple):
        return {"__tuple__": [_encode_meta(x) for x in v]}
    raise TypeError(f"unsupported static field {type(v)}")


def _decode_meta(v):
    if isinstance(v, dict) and "__tuple__" in v:
        return tuple(_decode_meta(x) for x in v["__tuple__"])
    return v


def _flatten(obj, arrays, path=""):
    """Recursively describe obj; leaf arrays appended to `arrays`."""
    if obj is None:
        return {"t": "none"}
    if isinstance(obj, (int, float, str, bool)):
        return {"t": "scalar", "v": obj}
    if isinstance(obj, tuple):
        return {"t": "tuple", "items": [_flatten(x, arrays) for x in obj]}
    if isinstance(obj, list):
        return {"t": "list", "items": [_flatten(x, arrays) for x in obj]}
    if isinstance(obj, dict):
        return {"t": "dict",
                "keys": [_encode_meta(k) for k in obj.keys()],
                "vals": [_flatten(v, arrays) for v in obj.values()]}
    if isinstance(obj, (np.ndarray, jax.Array)):
        a = np.asarray(obj)
        arrays.append(a)
        return {"t": "array", "dtype": str(a.dtype), "shape": list(a.shape)}
    if np.isscalar(obj) and hasattr(obj, "dtype"):  # numpy scalar
        a = np.asarray(obj)
        arrays.append(a)
        return {"t": "array", "dtype": str(a.dtype), "shape": []}
    # dataclass-pytree object
    cls = type(obj)
    if hasattr(obj, "__dataclass_fields__"):
        fields = {}
        for name in obj.__dataclass_fields__:
            fields[name] = _flatten(getattr(obj, name), arrays)
        return {"t": "obj", "cls": f"{cls.__module__}:{cls.__qualname__}",
                "fields": fields}
    if cls.__qualname__ == "GaloisKey":  # dict-of-keys bundle (ringkit)
        return {"t": "obj", "cls": f"{cls.__module__}:{cls.__qualname__}",
                "fields": {"keys": _flatten(obj.keys, arrays)}}
    raise TypeError(f"cannot serialize {type(obj)}")


def _unflatten(desc, blobs, it):
    t = desc["t"]
    if t == "none":
        return None
    if t == "scalar":
        return desc["v"]
    if t == "tuple":
        return tuple(_unflatten(d, blobs, it) for d in desc["items"])
    if t == "list":
        return [_unflatten(d, blobs, it) for d in desc["items"]]
    if t == "dict":
        return {(_decode_meta(k)): _unflatten(v, blobs, it)
                for k, v in zip(desc["keys"], desc["vals"])}
    if t == "array":
        idx = next(it)
        a = np.frombuffer(blobs[idx], dtype=np.dtype(desc["dtype"]))
        a = a.reshape(desc["shape"])
        import jax.numpy as jnp
        return jnp.asarray(a)
    if t == "obj":
        mod_name, qual = desc["cls"].split(":")
        cls = importlib.import_module(mod_name)
        for part in qual.split("."):
            cls = getattr(cls, part)
        kwargs = {k: _unflatten(v, blobs, it) for k, v in desc["fields"].items()}
        return cls(**kwargs)
    raise ValueError(t)


def serialize(obj: Any, level: int = 6) -> bytes:
    """Object -> compressed bytes (reference serializer::serialize)."""
    arrays: list = []
    desc = _flatten(obj, arrays)
    header = json.dumps(desc).encode()
    buf = io.BytesIO()
    buf.write(MAGIC)
    buf.write(struct.pack("<II", VERSION, len(header)))
    buf.write(header)
    buf.write(struct.pack("<I", len(arrays)))
    for a in arrays:
        raw = np.ascontiguousarray(a).tobytes()
        buf.write(struct.pack("<Q", len(raw)))
        buf.write(raw)
    return zlib.compress(buf.getvalue(), level)


def deserialize(data: bytes) -> Any:
    raw = zlib.decompress(data)
    buf = io.BytesIO(raw)
    assert buf.read(4) == MAGIC, "bad magic"
    version, hlen = struct.unpack("<II", buf.read(8))
    assert version == VERSION
    desc = json.loads(buf.read(hlen).decode())
    (n_arr,) = struct.unpack("<I", buf.read(4))
    blobs = []
    for _ in range(n_arr):
        (ln,) = struct.unpack("<Q", buf.read(8))
        blobs.append(buf.read(ln))
    return _unflatten(desc, blobs, iter(range(n_arr)))


def save_to_file(obj: Any, path: str, level: int = 6):
    data = serialize(obj, level=level)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(data)))
        f.write(data)


def load_from_file(path: str) -> Any:
    with open(path, "rb") as f:
        (ln,) = struct.unpack("<Q", f.read(8))
        return deserialize(f.read(ln))
