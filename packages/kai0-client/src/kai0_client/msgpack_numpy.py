"""msgpack codec with NumPy array support — the wire format of the policy server.

Wire-compatible with the reference client
(``packages/openpi-client/src/openpi_client/msgpack_numpy.py``): ndarrays are packed
as ``{b"__ndarray__": True, b"data", b"dtype", b"shape"}`` and numpy scalars as
``{b"__npgeneric__": True, b"data", b"dtype"}``; object/void/complex dtypes are
rejected (no pickle fallback — the protocol stays safe against arbitrary code
execution).
"""

import functools

import msgpack
import numpy as np

_REJECTED_KINDS = ("V", "O", "c")


def pack_array(obj):
    if isinstance(obj, (np.ndarray, np.generic)) and obj.dtype.kind in _REJECTED_KINDS:
        raise ValueError(f"Unsupported dtype: {obj.dtype}")

    if isinstance(obj, np.ndarray):
        return {
            b"__ndarray__": True,
            b"data": obj.tobytes(),
            b"dtype": obj.dtype.str,
            b"shape": obj.shape,
        }

    if isinstance(obj, np.generic):
        return {
            b"__npgeneric__": True,
            b"data": obj.item(),
            b"dtype": obj.dtype.str,
        }

    return obj


def unpack_array(obj):
    if b"__ndarray__" in obj:
        return np.ndarray(buffer=obj[b"data"], dtype=np.dtype(obj[b"dtype"]), shape=obj[b"shape"])

    if b"__npgeneric__" in obj:
        return np.dtype(obj[b"dtype"]).type(obj[b"data"])

    return obj


Packer = functools.partial(msgpack.Packer, default=pack_array)
packb = functools.partial(msgpack.packb, default=pack_array)

Unpacker = functools.partial(msgpack.Unpacker, object_hook=unpack_array)
unpackb = functools.partial(msgpack.unpackb, object_hook=unpack_array)
