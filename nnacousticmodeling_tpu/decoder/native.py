"""ctypes wrapper for the native host-side decoder
(``native/`` — libnnam_decoder.so).

The TPU decoder (viterbi.py) is the performance path; this native
implementation provides (a) a drop-in ``phonerecog`` CLI replacing the
reference binary (whose shipped source does not compile —
recog_src/source/main.cpp includes a missing my_stopwatch.h), and (b)
an in-process host fallback / cross-check oracle without the
reference's .lab-file + subprocess boundary.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import List, Optional

import numpy as np

from .viterbi import DecodeResult

NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
LIB_PATH = NATIVE_DIR / "build" / "libnnam_decoder.so"
CLI_PATH = NATIVE_DIR / "build" / "phonerecog"


def build_native(force: bool = False) -> bool:
    """Build the native library/CLI with cmake+ninja (no-op if built)."""
    if LIB_PATH.exists() and CLI_PATH.exists() and not force:
        return True
    build_dir = NATIVE_DIR / "build"
    build_dir.mkdir(exist_ok=True)
    try:
        subprocess.run(["cmake", "..", "-G", "Ninja"], cwd=build_dir,
                       check=True, capture_output=True)
        subprocess.run(["ninja"], cwd=build_dir, check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False
    return LIB_PATH.exists()


class NativeDecoder:
    """Host-side decoder over a decoding-image file."""

    def __init__(self, image_path: str, pip: float = 20.0, lmw: float = 1.0,
                 beam: Optional[float] = None):
        if not LIB_PATH.exists() and not build_native():
            raise RuntimeError("native decoder library is not built")
        self._lib = ctypes.CDLL(str(LIB_PATH))
        self._lib.nnam_decoder_create.restype = ctypes.c_void_p
        self._lib.nnam_decoder_create.argtypes = [
            ctypes.c_char_p, ctypes.c_float, ctypes.c_float]
        self._lib.nnam_decoder_decode.restype = ctypes.c_int
        self._lib.nnam_decoder_decode.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        self._lib.nnam_decoder_num_states.restype = ctypes.c_int
        self._lib.nnam_decoder_num_states.argtypes = [ctypes.c_void_p]
        self._lib.nnam_decoder_phone_name.restype = ctypes.c_int
        self._lib.nnam_decoder_phone_name.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int]
        self._lib.nnam_decoder_destroy.argtypes = [ctypes.c_void_p]

        self._lib.nnam_decoder_set_beam.argtypes = [
            ctypes.c_void_p, ctypes.c_float]
        self._lib.nnam_decoder_skipped_updates.restype = ctypes.c_int64
        self._lib.nnam_decoder_skipped_updates.argtypes = [ctypes.c_void_p]

        self._h = self._lib.nnam_decoder_create(
            str(image_path).encode(), ctypes.c_float(pip),
            ctypes.c_float(lmw))
        if not self._h:
            raise RuntimeError(f"cannot load image {image_path}")
        if beam is not None and beam > 0:
            self._lib.nnam_decoder_set_beam(self._h, ctypes.c_float(beam))
        self.num_states = self._lib.nnam_decoder_num_states(self._h)
        self._names: dict = {}

    @property
    def skipped_updates(self) -> int:
        """Triphone updates skipped by beam pruning (cumulative)."""
        return int(self._lib.nnam_decoder_skipped_updates(self._h))

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.nnam_decoder_destroy(self._h)
            self._h = None

    def _phone_name(self, tri: int) -> str:
        if tri not in self._names:
            buf = ctypes.create_string_buffer(64)
            n = self._lib.nnam_decoder_phone_name(self._h, tri, buf, 64)
            if n < 0:
                raise ValueError(f"bad triphone {tri}")
            self._names[tri] = buf.value.decode()
        return self._names[tri]

    def decode_one(self, log_probs: np.ndarray) -> DecodeResult:
        lp = np.ascontiguousarray(log_probs, dtype=np.float32)
        t, s = lp.shape
        if s != self.num_states:
            raise ValueError(f"posterior columns {s} != image states "
                             f"{self.num_states}")
        out = np.zeros((t + 1, 3), dtype=np.int32)
        n = self._lib.nnam_decoder_decode(
            self._h, lp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            t, s, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            out.shape[0])
        if n < 0:
            raise RuntimeError("native decode failed")
        return DecodeResult(segments=[
            (int(b), int(e), self._phone_name(int(tri)))
            for b, e, tri in out[:n]])

    def decode_batch(self, log_probs: List[np.ndarray],
                     n_threads: Optional[int] = None) -> List[DecodeResult]:
        """Decode many utterances across host cores.

        The reference gets utterance parallelism from OpenMP
        (recog_src/source/main.cpp:51-64); here ``Decoder::Decode`` is
        const with no shared scratch and ctypes drops the GIL for the
        call's duration, so a plain thread pool saturates the cores.
        """
        import os
        from concurrent.futures import ThreadPoolExecutor
        if n_threads is None:
            n_threads = min(len(log_probs), os.cpu_count() or 1)
        if n_threads <= 1 or len(log_probs) <= 1:
            return [self.decode_one(lp) for lp in log_probs]
        with ThreadPoolExecutor(max_workers=n_threads) as pool:
            return list(pool.map(self.decode_one, log_probs))
