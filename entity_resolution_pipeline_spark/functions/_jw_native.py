"""Optional native Jaro-Winkler batch kernel.

The Arrow-batched UDF boundary hands us whole columns; the per-pair
kernel is a tight char loop that Python/numpy cannot express
efficiently (measured: scalar Python ~20k pairs/s, bit-parallel numpy
~2.5x that — the numpy op overhead per batch column is the floor).  A
~60-line C translation of the SAME algorithm (functions/similarity.py
``jaro_winkler_py``, the parity oracle) runs >1M pairs/s.

The kernel compiles lazily with the system C compiler into a cache
directory and loads via ctypes; any failure (no compiler, readonly FS)
falls back to the numpy path — behavior is identical either way
(property-tested in tests/test_functions.py).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

import numpy as np

_C_SRC = r"""
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static double jw_one(const uint32_t *s1, int64_t len1,
                     const uint32_t *s2, int64_t len2,
                     uint8_t *flags1, uint8_t *flags2) {
    if (len1 == 0 || len2 == 0) return 0.0;
    int64_t maxlen = len1 > len2 ? len1 : len2;
    int64_t window = maxlen / 2 - 1;
    if (window < 0) window = 0;
    memset(flags1, 0, (size_t)len1);
    memset(flags2, 0, (size_t)len2);
    int64_t matches = 0;
    for (int64_t i = 0; i < len1; i++) {
        int64_t lo = i - window; if (lo < 0) lo = 0;
        int64_t hi = i + window + 1; if (hi > len2) hi = len2;
        for (int64_t j = lo; j < hi; j++) {
            if (!flags2[j] && s2[j] == s1[i]) {
                flags1[i] = 1; flags2[j] = 1; matches++;
                break;
            }
        }
    }
    double jaro;
    if (matches == 0) {
        jaro = 0.0;
    } else {
        int64_t transpositions = 0, k = 0;
        for (int64_t i = 0; i < len1; i++) {
            if (flags1[i]) {
                while (!flags2[k]) k++;
                if (s1[i] != s2[k]) transpositions++;
                k++;
            }
        }
        int64_t t = transpositions / 2;
        double m = (double)matches;
        jaro = (m / (double)len1 + m / (double)len2 + (m - (double)t) / m) / 3.0;
    }
    if (jaro > 0.7) {
        int64_t p = 0, pmax = 4;
        if (len1 < pmax) pmax = len1;
        if (len2 < pmax) pmax = len2;
        while (p < pmax && s1[p] == s2[p]) p++;
        jaro += (double)p * 0.1 * (1.0 - jaro);
    }
    return jaro;
}

void jw_batch(const uint32_t *a, const int64_t *off_a,
              const uint32_t *b, const int64_t *off_b,
              int64_t n, int64_t scratch_len, double *out) {
    uint8_t *f1 = (uint8_t *)malloc((size_t)scratch_len);
    uint8_t *f2 = (uint8_t *)malloc((size_t)scratch_len);
    if (!f1 || !f2) { free(f1); free(f2); return; }
    for (int64_t i = 0; i < n; i++) {
        out[i] = jw_one(a + off_a[i], off_a[i + 1] - off_a[i],
                        b + off_b[i], off_b[i + 1] - off_b[i], f1, f2);
    }
    free(f1); free(f2);
}
"""

_lib = None
_tried = False


def _load():
    """Compile (once, content-addressed) and load the kernel; None on
    any failure."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        digest = hashlib.md5(_C_SRC.encode()).hexdigest()[:16]
        cache = os.path.join(tempfile.gettempdir(), "er_spark_native")
        os.makedirs(cache, exist_ok=True)
        so_path = os.path.join(cache, f"jw_{digest}.so")
        if not os.path.exists(so_path):
            c_path = os.path.join(cache, f"jw_{digest}.c")
            with open(c_path, "w") as f:
                f.write(_C_SRC)
            subprocess.run(
                ["cc", "-O2", "-shared", "-fPIC", "-o", so_path + ".tmp", c_path],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(so_path + ".tmp", so_path)
        lib = ctypes.CDLL(so_path)
        lib.jw_batch.restype = None
        lib.jw_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _flatten(strs: list) -> tuple:
    offs = np.zeros(len(strs) + 1, dtype=np.int64)
    np.cumsum([len(s) for s in strs], out=offs[1:])
    flat = np.frombuffer("".join(strs).encode("utf-32-le"), dtype=np.uint32)
    if flat.size == 0:
        flat = np.zeros(1, dtype=np.uint32)  # valid pointer for ctypes
    return flat, offs


def jw_batch(a: list, b: list) -> "np.ndarray | None":
    """Batch Jaro-Winkler via the C kernel; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    n = len(a)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    fa, oa = _flatten(a)
    fb, ob = _flatten(b)
    scratch = max(int(np.diff(oa).max(initial=1)), int(np.diff(ob).max(initial=1)), 1)
    lib.jw_batch(
        fa.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        oa.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        fb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ob.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n,
        scratch,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
