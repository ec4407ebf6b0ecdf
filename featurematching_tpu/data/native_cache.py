"""Native binary sample cache + C++ loader bindings (ctypes).

Converts a map-style pair dataset into ONE flat binary file the C++ library
(native/fmtpu_loader.cpp) can mmap and batch-assemble without the GIL. The
record layout is fixed-shape (same fields as the train-step batch pytree);
Python owns the schema, C++ only moves bytes.

Build: `python -m featurematching_tpu.data.native_cache --build-lib` or
automatically on first use (g++ is in the image). Falls back cleanly if the
toolchain is unavailable — `NativeBatchLoader.available()` reports it.
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

_MAGIC = b"FMTP"
_VERSION = 1

# field schema: name -> (shape_without_batch, dtype); order defines layout
FieldSchema = Dict[str, Tuple[Tuple[int, ...], np.dtype]]


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native", "libfmtpu_loader.so")


def _src_path() -> str:
    return os.path.join(os.path.dirname(__file__), "..", "..", "native", "fmtpu_loader.cpp")


def build_library(force: bool = False) -> Optional[str]:
    """Compile the C++ loader with g++ if needed; returns the .so path."""
    so = os.path.abspath(_lib_path())
    src = os.path.abspath(_src_path())
    if os.path.exists(so) and not force:
        if os.path.getmtime(so) >= os.path.getmtime(src):
            return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             src, "-o", so],
            check=True, capture_output=True,
        )
        return so
    except Exception:
        return None


def _load_lib():
    so = build_library()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.fmtpu_open.restype = ctypes.c_void_p
    lib.fmtpu_open.argtypes = [ctypes.c_char_p]
    lib.fmtpu_num_samples.restype = ctypes.c_longlong
    lib.fmtpu_num_samples.argtypes = [ctypes.c_void_p]
    lib.fmtpu_sample_bytes.restype = ctypes.c_longlong
    lib.fmtpu_sample_bytes.argtypes = [ctypes.c_void_p]
    lib.fmtpu_gather.restype = ctypes.c_int
    lib.fmtpu_gather.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int,
    ]
    lib.fmtpu_prefetch_start.restype = ctypes.c_int
    lib.fmtpu_prefetch_start.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_longlong),
        ctypes.c_longlong, ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.fmtpu_prefetch_next.restype = ctypes.c_int
    lib.fmtpu_prefetch_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_ubyte)
    ]
    lib.fmtpu_prefetch_stop.argtypes = [ctypes.c_void_p]
    lib.fmtpu_close.argtypes = [ctypes.c_void_p]
    return lib


def schema_from_sample(sample: Dict[str, np.ndarray]) -> FieldSchema:
    return {
        k: (tuple(np.asarray(v).shape), np.asarray(v).dtype)
        for k, v in sorted(sample.items())
    }


def _record_bytes(schema: FieldSchema) -> int:
    return sum(
        int(np.prod(shape) or 1) * dt.itemsize for shape, dt in schema.values()
    )


def write_cache(path: str, dataset, schema: Optional[FieldSchema] = None) -> FieldSchema:
    """Serialize every dataset sample into the flat cache + a .schema.npz."""
    if schema is None:
        schema = schema_from_sample(dataset[0])
    rec_bytes = _record_bytes(schema)
    n = len(dataset)
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<IQQ", _VERSION, n, rec_bytes))
        for i in range(n):
            s = dataset[i]
            for k, (shape, dt) in schema.items():
                # note: ascontiguousarray promotes 0-d to 1-d; reshape to the
                # schema shape instead so scalars stay scalars
                arr = np.asarray(s[k], dtype=dt).reshape(shape)
                f.write(np.ascontiguousarray(arr).tobytes())
    np.savez(
        path + ".schema.npz",
        names=np.asarray(list(schema.keys())),
        shapes=np.asarray([str(v[0]) for v in schema.values()]),
        dtypes=np.asarray([str(v[1]) for v in schema.values()]),
    )
    return schema


def read_schema(path: str) -> FieldSchema:
    d = np.load(path + ".schema.npz")
    out: FieldSchema = {}
    for name, shape_s, dt_s in zip(d["names"], d["shapes"], d["dtypes"]):
        shape = tuple(int(x) for x in shape_s.strip("()").split(",") if x.strip())
        out[str(name)] = (shape, np.dtype(str(dt_s)))
    return out


class NativeBatchLoader:
    """Batch iterator backed by the C++ mmap/threadpool library."""

    _lib = None

    @classmethod
    def available(cls) -> bool:
        if cls._lib is None:
            cls._lib = _load_lib()
        return cls._lib is not None

    def __init__(self, cache_path: str, batch_size: int, num_threads: int = 8,
                 ring_slots: int = 3, process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        if not self.available():
            raise RuntimeError("native loader library unavailable (no g++?)")
        self.lib = type(self)._lib
        self.handle = self.lib.fmtpu_open(cache_path.encode())
        if not self.handle:
            raise FileNotFoundError(cache_path)
        self.schema = read_schema(cache_path)
        self.batch_size = batch_size
        self.num_threads = num_threads
        self.ring_slots = ring_slots
        self.rec_bytes = int(self.lib.fmtpu_sample_bytes(self.handle))
        self.n = int(self.lib.fmtpu_num_samples(self.handle))
        assert self.rec_bytes == _record_bytes(self.schema)
        # per-host strided shard, same convention as loader.BatchLoader
        if process_index is None:
            try:
                import jax

                process_index = jax.process_index()
                process_count = jax.process_count()
            except Exception:
                process_index, process_count = 0, 1
        self.process_index = process_index
        self.process_count = process_count or 1

    def __len__(self) -> int:
        n_local = len(range(self.process_index, self.n, self.process_count))
        return n_local // self.batch_size

    def _split(self, flat: np.ndarray) -> Dict[str, np.ndarray]:
        """[B, rec_bytes] raw -> field dict with shapes from the schema."""
        out = {}
        off = 0
        B = flat.shape[0]
        for k, (shape, dt) in self.schema.items():
            nbytes = int(np.prod(shape) or 1) * dt.itemsize
            blob = flat[:, off : off + nbytes]
            out[k] = np.frombuffer(blob.tobytes(), dtype=dt).reshape((B,) + shape)
            off += nbytes
        return out

    def gather(self, indices: Sequence[int]) -> Dict[str, np.ndarray]:
        idx = np.asarray(indices, np.int64)
        out = np.empty((len(idx), self.rec_bytes), np.uint8)
        rc = self.lib.fmtpu_gather(
            self.handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            len(idx),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            self.num_threads,
        )
        assert rc == 0
        return self._split(out)

    def epoch(self, epoch: int = 0, shuffle: bool = True, seed: int = 0
              ) -> Iterator[Dict[str, np.ndarray]]:
        idx = np.arange(self.n, dtype=np.int64)
        if shuffle:
            # same global order on every host, then strided host shard —
            # identical semantics to loader.BatchLoader.epoch_indices
            idx = np.random.default_rng((seed, epoch)).permutation(idx)
        idx = np.ascontiguousarray(idx[self.process_index :: self.process_count])
        nb = len(idx) // self.batch_size
        idx = idx[: nb * self.batch_size]
        rc = self.lib.fmtpu_prefetch_start(
            self.handle,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            len(idx), self.batch_size, self.num_threads, self.ring_slots,
        )
        assert rc == 0
        buf = np.empty((self.batch_size, self.rec_bytes), np.uint8)
        try:
            for _ in range(nb):
                got = self.lib.fmtpu_prefetch_next(
                    self.handle,
                    buf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                )
                if got <= 0:
                    break
                yield self._split(buf[:got])
        finally:
            self.lib.fmtpu_prefetch_stop(self.handle)

    def close(self) -> None:
        if self.handle:
            self.lib.fmtpu_close(self.handle)
            self.handle = None


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--build-lib", action="store_true")
    args = p.parse_args()
    if args.build_lib:
        so = build_library(force=True)
        print("built:", so)
