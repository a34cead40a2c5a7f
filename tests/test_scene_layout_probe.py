"""Byte-exact scene-layout proof against compiled C++ (g++/libstdc++).

The reference builds its 484-sphere field with draws embedded in *function
argument lists* (scene.h:124-125 center x/z draws inside glm::vec4(...), and
:135-136 metal r/g/b draws) — C++ leaves argument evaluation order
unspecified, so the layout depends on what g++ actually emits.  The engine
(mt19937 + uniform_real_distribution) is already proven bit-exact in
test_mt19937.py; this probe proves the *layout*: a standard-library-only C++
program with the same expression shapes (constructor calls with draws as
arguments) is compiled with g++ and every center/material/color byte is
compared against ``generate_random_scene``.

(Empirically g++ evaluates these argument lists left-to-right on x86-64 —
the order scene.py assumes; this test pins that assumption to the actual
compiler output instead of folklore.)
"""

import shutil
import struct
import subprocess
import tempfile
from pathlib import Path

import numpy as np
import pytest

from raytrace_tpu.models.scene import generate_random_scene

CPP_PROBE = r"""
#include <cstdio>
#include <cstring>
#include <cmath>
#include <random>

static float randomFloat(std::mt19937& engine, float min, float max) {
    std::uniform_real_distribution<float> distribution(min, max);
    return distribution(engine);
}
static float randomFloat(std::mt19937& engine) {
    return randomFloat(engine, 0.0f, 1.0f);
}

// plain stand-in for glm::vec4 — what matters is the constructor-call
// expression shape (argument evaluation order), not the type
struct V4 {
    float x, y, z, w;
    V4(float x_, float y_, float z_, float w_) : x(x_), y(y_), z(z_), w(w_) {}
    V4() : x(0), y(0), z(0), w(0) {}
};

// HSV->RGB exactly as scene.h:47-77 (s=0.75, v=0.45)
static V4 getRandomColor(std::mt19937& engine) {
    float h = std::floor(randomFloat(engine, 0.0f, 360.0f));
    float s = 0.75f, v = 0.45f;
    float C = s * v;
    float X = C * (1.0f - std::fabs(std::fmod(h / 60.0f, 2.0f) - 1.0f));
    float m = v - C;
    float r, g, b;
    if (h >= 0 && h < 60) { r = C, g = X, b = 0; }
    else if (h >= 60 && h < 120) { r = X, g = C, b = 0; }
    else if (h >= 120 && h < 180) { r = 0, g = C, b = X; }
    else if (h >= 180 && h < 240) { r = 0, g = X, b = C; }
    else if (h >= 240 && h < 300) { r = X, g = 0, b = C; }
    else { r = C, g = 0, b = X; }
    return { r + m, g + m, b + m, 1.0f };
}

static void pbits(float f) {
    unsigned u;
    std::memcpy(&u, &f, 4);
    std::printf("%08x\n", u);
}

int main() {
    std::mt19937 engine{};
    for (int a = -11; a < 11; a++) {
        for (int b = -11; b < 11; b++) {
            // the exact argument shape of scene.h:124-125
            V4 geometry = V4(float(a) + 0.9f * randomFloat(engine), 0.2f,
                             float(b) + 0.9f * randomFloat(engine), 0.2f);
            const float materialProbability = randomFloat(engine);
            int mat;
            V4 color;
            if (materialProbability < 0.7) {
                mat = 0;
                color = getRandomColor(engine);
            } else if (materialProbability < 0.85) {
                mat = 1;
                // the exact argument shape of scene.h:135-136
                color = V4(randomFloat(engine, 0.5f, 1.0f), randomFloat(engine, 0.5f, 1.0f),
                    randomFloat(engine, 0.5f, 1.0f), 1.0f);
            } else {
                mat = 2;
                color = V4(1.0f, 1.0f, 1.0f, 1.0f);
            }
            pbits(geometry.x);
            pbits(geometry.z);
            std::printf("%d\n", mat);
            pbits(color.x);
            pbits(color.y);
            pbits(color.z);
        }
    }
    return 0;
}
"""


@pytest.mark.skipif(shutil.which("g++") is None, reason="g++ not available")
def test_layout_bytes_match_gpp():
    with tempfile.TemporaryDirectory() as td:
        src = Path(td) / "layout.cpp"
        exe = Path(td) / "layout"
        src.write_text(CPP_PROBE)
        subprocess.run(["g++", "-O2", "-std=c++17", "-o", str(exe), str(src)],
                       check=True)
        lines = subprocess.run([str(exe)], capture_output=True, text=True,
                               check=True).stdout.split()
    assert len(lines) == 484 * 6

    def fbits(hexstr):
        return struct.unpack("<f", struct.pack("<I", int(hexstr, 16)))[0]

    sc = generate_random_scene(0.0)
    for i in range(484):
        cx, cz, mat, r, g, b = lines[6 * i : 6 * i + 6]
        s = 4 + i
        ours = (sc.centers[s, 0], sc.centers[s, 2], int(sc.material[s]),
                sc.color0[s, 0], sc.color0[s, 1], sc.color0[s, 2])
        theirs = (np.float32(fbits(cx)), np.float32(fbits(cz)), int(mat),
                  np.float32(fbits(r)), np.float32(fbits(g)), np.float32(fbits(b)))
        assert ours == theirs, (i, ours, theirs)
