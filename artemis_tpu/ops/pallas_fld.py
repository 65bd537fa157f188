"""Fused Pallas kernels for the FLD radiation solve (radiation.py).

The jnp FLD step materializes ~12 rolled full-grid arrays in the
operator setup (gradient limiter + face averaging) and 6 per CG matvec;
XLA's fusion already runs those chains at ~240 GB/s effective, so the
win here is structural, not magic: one VMEM pass per setup / matvec
with in-register lane/sublane rotates instead of roll materializations.

Both kernels are pure BlockSpec pipelines over z-blocks — the z-halo
arrives as the (i±1 mod nzb) neighbor blocks (Mosaic double-buffers
them like any other input), NOT as manual DMAs, which would serialize
the gather against compute.  Wrap-around neighbor semantics match the
jnp path's `jnp.roll`; physical edges are masked through the
coefficients exactly as radiation.py does, so wrapped values never
contribute.  Gate: 3-D uniform Cartesian widths, unsharded node
(`supported()` conditions enforced by the caller radiation.py).

Reference: jaybenne's IMC transport solves the same gray problem by
photon Monte Carlo (jaybenne.cpp); the deterministic FLD design is the
north-star replacement (BASELINE.json)."""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM = int(os.environ.get("ARTEMIS_CURV_VMEM_MB", "126")) * 1024 * 1024


def _interpret_mode() -> bool:
    return os.environ.get("ARTEMIS_PALLAS_INTERPRET") == "1"


def enabled() -> bool:
    """Pallas FLD path gate — OPT-IN (ARTEMIS_PALLAS_RAD=1), default
    off.  Measured on v5e at 256x256x64: XLA's fused roll chains
    already run the 7-point matvec at ~240 GB/s effective (0.72 ms),
    and the pipelined BlockSpec kernel cannot beat it (0.86 ms — the
    6-coefficient read traffic dominates and XLA fuses the multiply
    chains as well as the kernel does).  Kept as a measured
    alternative and for the interpret-mode parity test."""
    if os.environ.get("ARTEMIS_PALLAS", "1") == "0":
        return False
    if os.environ.get("ARTEMIS_PALLAS_RAD", "0") != "1":
        return False
    if _interpret_mode():
        return True
    return jax.default_backend() != "cpu"


def _pick_tz(nz):
    for t in (16, 8, 4, 2):
        if nz % t == 0 and nz >= t:
            return t
    return 1


def supported(nz) -> bool:
    """Both kernels assemble 2-row z halos from the neighbor blocks,
    so the z tile must be >= 2 — odd nz (tz = 1) falls back to jnp."""
    return _pick_tz(nz) >= 2


def _zb(tz, ny, nx, nzb, which, c=None):
    """BlockSpec for a (nz, ny, nx) [or (c, nz, ny, nx)] operand: the
    block at z-index i+which (mod nzb — wrap matches jnp.roll)."""
    if c is None:
        return pl.BlockSpec((tz, ny, nx),
                            lambda i, _w=which: ((i + _w) % nzb, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((c, tz, ny, nx),
                        lambda i, _w=which: (0, (i + _w) % nzb, 0, 0),
                        memory_space=pltpu.VMEM)


def _roll(a, shift, axis):
    """In-VMEM cyclic shift (wrap semantics = the jnp path's roll;
    jnp.roll lowers to Mosaic's lane/sublane rotate inside kernels)."""
    return jnp.roll(a, shift, axis=axis)


def _coeffs_kernel(dt_ref, em_ref, ec_ref, ep_ref, cm_ref, cc_ref,
                   cp_ref, a_ref, dg_ref, dc_ref, *, nz, ny, nx, tz,
                   dxs, c_code, ext, flags, tiny):
    i = pl.program_id(0)
    z0 = i * tz
    # z-extended slabs from the neighbor blocks (wrap = jnp.roll)
    E = jnp.concatenate([em_ref[tz - 2:], ec_ref[...], ep_ref[:2]],
                        axis=0)                      # rows z0-2..z0+tz+1
    chi = jnp.concatenate([cm_ref[tz - 1:], cc_ref[...], cp_ref[:1]],
                          axis=0)                    # rows z0-1..z0+tz
    dt = dt_ref[0]
    idx, idy, idz = (1.0 / dxs[0], 1.0 / dxs[1], 1.0 / dxs[2])
    # gradient magnitude on rows z0-1 .. z0+tz (slab rows 1..tz+2)
    gx = (_roll(E, -1, 2) - _roll(E, 1, 2)) * (0.5 * idx)
    gy = (_roll(E, -1, 1) - _roll(E, 1, 1)) * (0.5 * idy)
    gz = (E[2:] - E[:-2]) * (0.5 * idz)
    g2 = gx[1:tz + 3] ** 2 + gy[1:tz + 3] ** 2 + gz ** 2
    Em = E[1:tz + 3]
    R = jnp.sqrt(g2) / (chi * jnp.maximum(Em, tiny) + tiny)
    lam = (2.0 + R) / (6.0 + 3.0 * R + R * R)        # Levermore-Pomraning
    Dc = c_code * lam / (chi + tiny)
    Dc = jnp.minimum(Dc, c_code * ext)               # FLD validity cap
    Dout = Dc[1:tz + 1]                              # cells z0 .. z0+tz-1

    # global-edge masks (x: lane iota; y: sublane iota; z: from z0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 2)
    iy = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 1)
    iz = jax.lax.broadcasted_iota(jnp.int32, (tz, ny, nx), 0) + z0
    first = {1: ix == 0, 2: iy == 0, 3: iz == 0}
    last = {1: ix == nx - 1, 2: iy == ny - 1, 3: iz == nz - 1}

    hi_n = {1: _roll(Dout, -1, 2), 2: _roll(Dout, -1, 1), 3: Dc[2:tz + 2]}
    lo_n = {1: _roll(Dout, 1, 2), 2: _roll(Dout, 1, 1), 3: Dc[:tz]}
    iw2 = {1: idx * idx, 2: idy * idy, 3: idz * idz}
    diag = jnp.ones_like(Dout)
    for d in (1, 2, 3):
        D_hi = 0.5 * (Dout + hi_n[d])
        D_lo = 0.5 * (Dout + lo_n[d])
        lo_dir, hi_dir = flags[d - 1]
        if hi_dir:
            D_hi = jnp.where(last[d], Dout, D_hi)
            A_hi = jnp.where(last[d], 0.0, D_hi)
        else:
            D_hi = jnp.where(last[d], 0.0, D_hi)
            A_hi = D_hi
        if lo_dir:
            D_lo = jnp.where(first[d], Dout, D_lo)
            A_lo = jnp.where(first[d], 0.0, D_lo)
        else:
            D_lo = jnp.where(first[d], 0.0, D_lo)
            A_lo = D_lo
        diag = diag + dt * ((D_hi + D_lo) * iw2[d])
        a_ref[2 * (d - 1)] = (dt * iw2[d]) * A_lo
        a_ref[2 * d - 1] = (dt * iw2[d]) * A_hi
    dg_ref[...] = diag
    dc_ref[...] = Dout


def fld_coeffs(E, chi, dt, dxs, c_code, ext, flags, interpret=None):
    """(A[6], diag_geo, Dcell) for the FLD operator on one node.

    ``E``/``chi``: (nz, ny, nx); ``dxs``: static (dx, dy, dz);
    ``flags``: per-dim (lo_is_dirichlet, hi_is_dirichlet) static bools.
    A rows: [AL1, AH1, AL2, AH2, AL3, AH3], dt and 1/w^2 folded in."""
    if interpret is None:
        interpret = _interpret_mode()
    nz, ny, nx = E.shape
    tz = _pick_tz(nz)
    if tz < 2:
        raise ValueError(f"fld_coeffs needs an even z extent (nz={nz}); "
                         "gate with pallas_fld.supported(nz)")
    tiny = float(jnp.finfo(E.dtype).tiny)
    nzb = nz // tz
    kern = functools.partial(
        _coeffs_kernel, nz=nz, ny=ny, nx=nx, tz=tz,
        dxs=tuple(float(v) for v in dxs), c_code=float(c_code),
        ext=float(ext), flags=tuple(tuple(f) for f in flags), tiny=tiny)

    def zb(which, c=None):
        return _zb(tz, ny, nx, nzb, which, c)

    A, dg, dc = pl.pallas_call(
        kern,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            zb(-1), zb(0), zb(1),        # E blocks (z-halo via neighbors)
            zb(-1), zb(0), zb(1),        # chi blocks
        ],
        out_specs=(zb(0, 6), zb(0), zb(0)),
        out_shape=(jax.ShapeDtypeStruct((6, nz, ny, nx), E.dtype),
                   jax.ShapeDtypeStruct((nz, ny, nx), E.dtype),
                   jax.ShapeDtypeStruct((nz, ny, nx), E.dtype)),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(dt, E.dtype), (1,)), E, E, E, chi, chi, chi)
    return A, dg, dc


def _matvec_kernel(em_ref, ec_ref, ep_ref, a_ref, dg_ref, sf_ref,
                   out_ref, *, tz):
    Ec = ec_ref[...]
    Ezm = jnp.concatenate([em_ref[tz - 1:], Ec[:tz - 1]], axis=0)
    Ezp = jnp.concatenate([Ec[1:], ep_ref[:1]], axis=0)
    out = (dg_ref[...] + sf_ref[...]) * Ec
    out = out - a_ref[1] * _roll(Ec, -1, 2) - a_ref[0] * _roll(Ec, 1, 2)
    out = out - a_ref[3] * _roll(Ec, -1, 1) - a_ref[2] * _roll(Ec, 1, 1)
    out = out - a_ref[5] * Ezp - a_ref[4] * Ezm
    out_ref[...] = out


def fld_matvec(E, A, diag_geo, sf, interpret=None):
    """(diag_geo + sf) E - sum_d (AH_d E_+d + AL_d E_-d) in one pass."""
    if interpret is None:
        interpret = _interpret_mode()
    nz, ny, nx = E.shape
    tz = _pick_tz(nz)
    if tz < 2:
        raise ValueError(f"fld_matvec needs an even z extent (nz={nz}); "
                         "gate with pallas_fld.supported(nz)")
    nzb = nz // tz
    kern = functools.partial(_matvec_kernel, tz=tz)

    def zb(which, c=None):
        return _zb(tz, ny, nx, nzb, which, c)

    out = pl.pallas_call(
        kern,
        grid=(nzb,),
        in_specs=[zb(-1), zb(0), zb(1), zb(0, 6), zb(0), zb(0)],
        out_specs=zb(0),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), E.dtype),
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(E, E, E, A, diag_geo, sf)
    return out
