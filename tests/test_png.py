"""PNG writer roundtrip (utils/png.py), decoded independently with PIL."""

import numpy as np
import pytest

from raytrace_tpu.utils.png import write_png


def test_roundtrip(tmp_path):
    PIL = pytest.importorskip("PIL.Image")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (33, 47, 3), dtype=np.uint8)
    p = tmp_path / "t.png"
    write_png(str(p), img)
    back = np.asarray(PIL.open(p).convert("RGB"))
    assert np.array_equal(back, img)


def test_rejects_bad_input(tmp_path):
    with pytest.raises(ValueError):
        write_png(str(tmp_path / "x.png"), np.zeros((4, 4), np.uint8))
    with pytest.raises(ValueError):
        write_png(str(tmp_path / "x.png"), np.zeros((4, 4, 3), np.float32))
