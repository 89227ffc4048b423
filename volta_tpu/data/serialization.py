"""msgpack-numpy compatible (de)serialisation.

The reference's Conceptual Captions shards are tensorpack LMDBSerializer
environments: keys ``b"{idx:08}"`` plus ``b"__keys__"``, values msgpack blobs
with msgpack_numpy array encoding (reference:
data/conceptual_captions/preprocess_cc_train.py:30-70,
volta/datasets/concept_cap_dataset.py:202-204). msgpack is available here but
msgpack_numpy is not, so the array encoding hooks are implemented locally.
"""

from __future__ import annotations

import msgpack
import numpy as np


def _encode(obj):
    if isinstance(obj, np.ndarray):
        if obj.dtype.kind == "O":
            raise TypeError("object arrays not supported")
        return {b"nd": True, b"type": obj.dtype.str,
                b"shape": list(obj.shape), b"data": obj.tobytes()}
    if isinstance(obj, (np.bool_, np.number)):
        return {b"nd": False, b"type": obj.dtype.str,
                b"data": obj.tobytes()}
    return obj


def _decode(obj):
    if b"nd" in obj:
        if obj[b"nd"]:
            shape = obj.get(b"shape", [])
            return np.frombuffer(obj[b"data"],
                                 dtype=np.dtype(obj[b"type"])).reshape(shape)
        return np.frombuffer(obj[b"data"],
                             dtype=np.dtype(obj[b"type"]))[0]
    # msgpack_numpy legacy 'complex' encoding not needed
    return obj


def dumps(obj) -> bytes:
    return msgpack.packb(obj, default=_encode, use_bin_type=True)


def loads(buf: bytes):
    return msgpack.unpackb(buf, object_hook=_decode, raw=True,
                           max_bin_len=2 ** 31 - 1,
                           max_array_len=2 ** 31 - 1,
                           max_str_len=2 ** 31 - 1)


def tensorpack_key(idx: int) -> bytes:
    return "{:08}".format(idx).encode("ascii")
