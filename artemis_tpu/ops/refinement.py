"""AMR tagging criteria (reference: src/utils/refinement/amr_criteria.hpp).

Pure functions from a primitive field to refine/derefine tags, used by the
static/adaptive refinement driver to place fine patches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def scalar_magnitude(field, refine_thr, deref_thr):
    """Tag where |field| exceeds refine_thr; untag below deref_thr
    (ScalarMagnitude)."""
    refine = field > refine_thr
    deref = field < deref_thr
    return refine, deref


def grid_stencil_widths(grid):
    """Per-cell physical stencil widths for the gradient criterion.

    The reference (amr_criteria.hpp:69-86) normalizes each centered
    difference by ``sdx_d * h_d`` where ``sdx_d = xv_{+1} - xv_{-1}`` is
    the centroid stencil span and ``h_d`` the scale factor at the cell.
    Returns (w1, w2, w3) broadcastable to the interior [x3, x2, x1]
    layout (inactive axes get width 1; they are excluded from ``dims``).
    """
    g = grid.geom
    ng1, ng2, ng3 = grid.ng
    n1, n2, n3 = grid.nx

    def span(xv, lo, n):
        if n <= 1:
            return np.ones((1,), xv.dtype)
        return xv[lo + 1:lo + n + 1] - xv[lo - 1:lo + n - 1]

    x1i = g.xv1[ng1:ng1 + n1][None, None, :]
    x2i = g.xv2[ng2:ng2 + n2][None, :, None]
    w1 = span(g.xv1, ng1, n1)[None, None, :] * g.hx(1, x1i, x2i)
    w2 = span(g.xv2, ng2, n2)[None, :, None] * g.hx(2, x1i, x2i)
    w3 = span(g.xv3, ng3, n3)[:, None, None] * g.hx(3, x1i, x2i)
    return w1, w2, w3


def scalar_first_derivative(field, widths, dims, refine_thr, deref_thr,
                            bc=None):
    """Normalized gradient magnitude criterion (ScalarFirstDerivative,
    amr_criteria.hpp:28-96).

    ``widths[d-1]`` is the physical stencil width ``sdx_d * h_d``
    (``grid_stencil_widths``); the criterion is
    ``eps = |grad f| * sqrt(sum_d w_d^2) / |f|`` as in the reference.

    ``bc`` (the grid's per-axis boundary pair) selects the edge stencil:
    the reference evaluates the centered difference through BC-filled
    ghost cells (amr_criteria.hpp:49-66 runs over interior+-1), so a
    periodic axis wraps while any other axis sees edge-replicated
    neighbors (the outflow/reflect ghost value for a scalar) — a steep
    feature at one outflow edge must not tag cells at the opposite edge.
    ``bc=None`` keeps the legacy all-wrap stencil.
    """
    g2 = 0.0
    w2 = 0.0
    for d in dims:
        w = widths[d - 1]
        periodic = bc is None or bc[d - 1] == ("periodic", "periodic")
        ax = field.ndim - d
        if periodic:
            fp = jnp.roll(field, -1, axis=ax)
            fm = jnp.roll(field, 1, axis=ax)
        else:
            n = field.shape[ax]
            fp = jnp.concatenate(
                [jax.lax.slice_in_dim(field, 1, n, axis=ax),
                 jax.lax.slice_in_dim(field, n - 1, n, axis=ax)], axis=ax)
            fm = jnp.concatenate(
                [jax.lax.slice_in_dim(field, 0, 1, axis=ax),
                 jax.lax.slice_in_dim(field, 0, n - 1, axis=ax)], axis=ax)
        df = (fp - fm) / w
        g2 = g2 + df ** 2
        w2 = w2 + w ** 2
    eps = jnp.sqrt(g2) * jnp.sqrt(w2) / jnp.maximum(jnp.abs(field), 1e-300)
    return eps > refine_thr, eps < deref_thr
