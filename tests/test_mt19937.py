"""mt19937.py must be bit-exact with std::mt19937 + libstdc++ float draws.

The scene generator's layout depends on it (scene.h:120 uses a default-seeded
``std::mt19937``).  Validated two ways: the C++-standard-mandated 10000th
output, and a g++-compiled probe of raw draws + ``uniform_real_distribution``
(standard-library usage only — no reference code involved).
"""

import shutil
import subprocess
import sys
import tempfile
from pathlib import Path

import numpy as np
import pytest

from raytrace_tpu.models.mt19937 import MT19937, canonical_float, uniform_float

CPP_PROBE = r"""
#include <cstdio>
#include <random>
int main() {
    std::mt19937 eng{};
    for (int i = 0; i < 64; i++) printf("%u\n", (unsigned)eng());
    std::mt19937 eng2{};
    std::uniform_real_distribution<float> d01(0.0f, 1.0f);
    std::uniform_real_distribution<float> dw(0.5f, 1.0f);
    for (int i = 0; i < 64; i++) printf("%.9e\n", d01(eng2));
    for (int i = 0; i < 64; i++) printf("%.9e\n", dw(eng2));
    return 0;
}
"""


def test_standard_10000th_value():
    # ISO C++ [rand.predef]: mt19937's 10000th consecutive invocation
    # from the default seed produces 4123659995.
    eng = MT19937()
    for _ in range(9999):
        eng.next_u32()
    assert eng.next_u32() == 4123659995


@pytest.mark.skipif(shutil.which("g++") is None, reason="g++ not available")
def test_matches_libstdcpp():
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "probe.cpp"
        exe = Path(td) / "probe"
        src.write_text(CPP_PROBE)
        subprocess.run(["g++", "-O1", "-o", str(exe), str(src)], check=True)
        lines = subprocess.run([str(exe)], capture_output=True, text=True, check=True).stdout.split()
    raw = [int(x) for x in lines[:64]]
    f01 = [np.float32(x) for x in lines[64:128]]
    fw = [np.float32(x) for x in lines[128:192]]

    eng = MT19937()
    assert [eng.next_u32() for _ in range(64)] == raw

    eng = MT19937()
    ours01 = [uniform_float(eng) for _ in range(64)]
    ours_w = [uniform_float(eng, 0.5, 1.0) for _ in range(64)]
    assert all(a == b for a, b in zip(ours01, f01)), (ours01[:5], f01[:5])
    assert all(a == b for a, b in zip(ours_w, fw)), (ours_w[:5], fw[:5])


def test_canonical_float_below_one():
    eng = MT19937()
    for _ in range(1000):
        v = canonical_float(eng)
        assert 0.0 <= float(v) < 1.0
