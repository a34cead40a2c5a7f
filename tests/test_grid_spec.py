"""Speculative multi-cell fetch (j_steps >= 2): output is invariant to j.

The grid kernel's j>=2 production path computes the whole DDA cell chain
speculatively (ops/gridkernel.py _gather_rows_multi) — the advance direction
depends only on t_nx/t_nz, never on hit results, so all j cells fetch in ONE
gather per chunk.  The pinned invariant: the image BITS are identical for
every j (and for the sequential "nodual" structure), because stopped lanes'
speculative tail fetches are masked and continuing lanes' speculative chain
replays the gated advance exactly.

Own file: each j compiles a large interpret-mode program (CLAUDE.md: too
many per pytest process can crash this host's XLA:CPU).
"""

import numpy as np
import pytest

from raytrace_tpu.models.scene import generate_random_scene
from raytrace_tpu.ops.trace import (prepare_scene, render_band_core,
                                    viewport_arrays)
from raytrace_tpu.runtime.renderer import reference_camera

W, H = 64, 36


@pytest.fixture(scope="module")
def book():
    return prepare_scene(generate_random_scene(0.0))


def _render(ds, *, grid_steps, depth=8, spp=2, m=2, ablate=()):
    vp = viewport_arrays(reference_camera(), W, H)
    return np.asarray(render_band_core(
        ds, vp, band_h=H, width=W, y0=np.int32(0), seed_y0=np.int32(0),
        offset_x=np.int32(0), spp=np.int32(spp), number=np.uint32(0),
        max_depth=depth, backend="grid", pixels_per_lane=m, skip_tmax=True,
        grid_steps=grid_steps, ablate=ablate))


def test_j_invariance_bitwise(book):
    base = _render(book, grid_steps=(2, 4))
    for j in (1, 3, 4):
        out = _render(book, grid_steps=(j, 4))
        assert np.array_equal(base, out), f"grid j={j} diverged from j=2"


def test_spec_matches_sequential_structure(book):
    """The one-gather speculative path == the sequential per-step fetch."""
    spec = _render(book, grid_steps=(3, 4))
    seq = _render(book, grid_steps=(3, 4), ablate=("nodual",))
    assert np.array_equal(spec, seq)
