"""Smoke test of the C-ABI shared library via ctypes.

Mirror of the reference's scripts/test.py:1-7 (which loads ray_trace.dll and
invokes the exported ray_trace).  Build the library first:

    make -C native

Unlike the reference's (whose argument list predates the current 5-arg
signature — SURVEY.md C15), this passes arguments that match the ABI.
"""

import ctypes
import os
import sys

lib_path = os.path.join(os.path.dirname(__file__), "..", "native", "build", "libraytrace.so")
ray = ctypes.CDLL(lib_path)
ray.ray_trace.argtypes = [
    ctypes.c_uint32, ctypes.c_bool, ctypes.c_uint32, ctypes.c_uint32, ctypes.c_uint32
]
samples = int(sys.argv[1]) if len(sys.argv) > 1 else 4
ray.ray_trace(samples, True, 192, 108, 1)
print("ok")
