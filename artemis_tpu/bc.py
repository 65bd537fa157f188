"""Boundary conditions as ghost-zone fills on primitive arrays.

Replaces the reference's Parthenon boundary machinery + named artemis BCs
(``ArtemisBC``: reflect/outflow/extrap/inflow/conduct/ic/visc/user/periodic,
src/artemis.hpp:90-105 and src/pgen/problem_modifier.hpp:41-144).  Physical
BCs are pure functions ``w -> w`` writing the ghost slabs of the primitive
array; problem generators register custom fills in a per-run registry.

For multi-device runs only the outermost shards apply physical BCs; interior
shard edges are filled by halo exchange (artemis_tpu/parallel).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp


def _axs(ndim: int, d: int, sl: slice):
    out = [slice(None)] * ndim
    out[-d] = sl
    return tuple(out)


def _flip(arr, d: int):
    return jnp.flip(arr, axis=-d)


def apply_periodic(w, d: int, ng: int, n: int):
    nd = w.ndim
    # lower ghosts <- last ng interior; upper ghosts <- first ng interior
    w = w.at[_axs(nd, d, slice(0, ng))].set(w[_axs(nd, d, slice(n, n + ng))])
    w = w.at[_axs(nd, d, slice(n + ng, n + 2 * ng))].set(w[_axs(nd, d, slice(ng, 2 * ng))])
    return w


def apply_outflow(w, d: int, ng: int, n: int, side: int):
    nd = w.ndim
    if side == 0:
        edge = w[_axs(nd, d, slice(ng, ng + 1))]
        w = w.at[_axs(nd, d, slice(0, ng))].set(
            jnp.broadcast_to(edge, w[_axs(nd, d, slice(0, ng))].shape))
    else:
        edge = w[_axs(nd, d, slice(n + ng - 1, n + ng))]
        w = w.at[_axs(nd, d, slice(n + ng, n + 2 * ng))].set(
            jnp.broadcast_to(edge, w[_axs(nd, d, slice(n + ng, n + 2 * ng))].shape))
    return w


def apply_reflecting(w, d: int, ng: int, n: int, side: int, vel_comp: int):
    """Mirror all components; negate the normal velocity component.

    ``vel_comp`` is the component index of the normal velocity within the
    variable axis (axis 1 of ``w``: [ns, C, z, y, x]).
    """
    nd = w.ndim
    if side == 0:
        src = _flip(w[_axs(nd, d, slice(ng, 2 * ng))], d)
        dst = _axs(nd, d, slice(0, ng))
    else:
        src = _flip(w[_axs(nd, d, slice(n, n + ng))], d)
        dst = _axs(nd, d, slice(n + ng, n + 2 * ng))
    src = src.at[:, vel_comp].multiply(-1.0)
    return w.at[dst].set(src)


# custom BC registry: name -> fn(w, grid, fluid, d, side) -> w
CustomBC = Callable[..., object]


def pad_prims(w_int, grid, extra=(0, 0)):
    """Pad an interior primitive array with ghost slabs (edge-replicated;
    every ghost cell is overwritten by fill_ghosts / halo exchange).

    ``extra = (ey, ex)`` appends unused trailing rows/lanes so a fused
    kernel's DMA-alignment padding is produced here in the same copy
    instead of a second full-array pass."""
    ng = grid.ng
    ey, ex = extra
    pads = [(0, 0)] * (w_int.ndim - 3) + [(ng[2], ng[2]), (ng[1], ng[1] + ey),
                                          (ng[0], ng[0] + ex)]
    return jnp.pad(w_int, pads, mode="edge")


def pad_and_fill(w_int, grid, fluid: str, custom: Optional[Dict[str, CustomBC]] = None,
                 extra=(0, 0)):
    """Interior prims -> ghost-padded prims with all BCs applied."""
    if extra == (0, 0) and all(grid.bc[d - 1] == ("periodic", "periodic")
                               for d in (1, 2, 3) if grid.active(d)):
        return _periodic_concat(w_int, grid)
    return fill_ghosts(pad_prims(w_int, grid, extra), grid, fluid, custom)


def _periodic_concat(w_int, grid):
    """Fast ghost fill for all-periodic boundaries: one concatenate per
    active axis instead of pad + per-face scatter (fewer full-array copies
    on the hot path)."""
    ng = grid.ng
    out = w_int
    for d in (1, 2, 3):
        g = ng[d - 1]
        if g == 0:
            continue
        ax = out.ndim - d
        lo = [slice(None)] * out.ndim
        hi = [slice(None)] * out.ndim
        lo[ax] = slice(-g, None)
        hi[ax] = slice(0, g)
        out = jnp.concatenate([out[tuple(lo)], out, out[tuple(hi)]], axis=ax)
    return out


def fill_ghosts(w, grid, fluid: str, custom: Optional[Dict[str, CustomBC]] = None):
    """Apply all six boundary fills to a primitive array."""
    custom = custom or {}
    for d in (1, 2, 3):
        if not grid.active(d):
            continue
        ng = grid.nghost
        n = grid.nx[d - 1]
        inner, outer = grid.bc[d - 1]
        if inner == "periodic" or outer == "periodic":
            if inner != outer:
                raise ValueError(f"periodic BC must be two-sided in x{d}")
            w = apply_periodic(w, d, ng, n)
            continue
        for side, name in ((0, inner), (1, outer)):
            if name in custom:
                w = custom[name](w, grid, fluid, d, side)
            elif name == "outflow":
                w = apply_outflow(w, d, ng, n, side)
            elif name in ("reflecting", "reflect"):
                w = apply_reflecting(w, d, ng, n, side, vel_comp=d)
            elif name == "none":
                pass
            else:
                raise ValueError(f"unknown boundary condition {name!r} in x{d}")
    return w
