"""AMR tagging criteria (reference: src/utils/refinement/amr_criteria.hpp).

Pure functions from a primitive field to refine/derefine tags, used by the
static/adaptive refinement driver to place fine patches.
"""

from __future__ import annotations

import jax.numpy as jnp


def scalar_magnitude(field, refine_thr, deref_thr):
    """Tag where |field| exceeds refine_thr; untag below deref_thr
    (ScalarMagnitude)."""
    refine = field > refine_thr
    deref = field < deref_thr
    return refine, deref


def scalar_first_derivative(field, widths, dims, refine_thr, deref_thr):
    """Normalized gradient magnitude criterion (ScalarFirstDerivative,
    amr_criteria.hpp:28-80): |grad f| * dx / f compared against thresholds."""
    g2 = 0.0
    for d in dims:
        w = widths[d - 1]
        df = (jnp.roll(field, -1, axis=-d) - jnp.roll(field, 1, axis=-d)) / 2.0
        g2 = g2 + (df / jnp.maximum(jnp.abs(field), 1e-300)) ** 2
    g = jnp.sqrt(g2)
    return g > refine_thr, g < deref_thr
