"""Accumulator -> display image conversion (the rgba8 render target path).

Reference: shader.rgen:65-66 — ``pixelColor = sqrt(summedPixelColor /
samplesPerRenderCall)`` (gamma-2) written to an rgba8 UNORM image (round to
nearest on [0,1]).  The reference divides by the *per-call* sample count even
when an accumulator carries older calls (quirk Q3/SURVEY.md); ``total_samples``
lets callers implement the progressive semantics the design intends.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def tonemap(accum, samples):
    """sqrt(sum/samples), clamped to [0,1] — shader.rgen:65."""
    xp = jnp if not isinstance(accum, np.ndarray) else np
    img = xp.sqrt(xp.clip(accum / xp.asarray(samples, accum.dtype), 0.0, None))
    return xp.clip(img, 0.0, 1.0)


def to_u8(img01):
    """[0,1] float -> u8 with round-to-nearest (Vulkan UNORM conversion)."""
    xp = jnp if not isinstance(img01, np.ndarray) else np
    return xp.round(img01 * 255.0).astype(xp.uint8)


def accum_to_u8(accum, samples):
    return to_u8(tonemap(accum, samples))
