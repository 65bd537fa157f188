"""Fused Pallas kernels for the FLD radiation solve (radiation.py).

The jnp FLD step costs ~40 full-grid shift materializations per solve
(gradient limiter + face coefficients + one 7-point matvec per CG
iteration, each `jnp.roll` a lane/sublane relayout on TPU) while the CG
itself converges in ~4 iterations on production disks — the SETUP, not
the solve, dominates.  Two kernels remove nearly all of it:

  fld_coeffs  — one VMEM pass: Levermore-Pomraning limiter, capped
                diffusivity, face-averaged/masked operator coefficients
                (AL/AH per dim, dt and 1/w^2 folded), Jacobi diagonal,
                and Dcell (for the Dirichlet RHS planes built outside).
  fld_matvec  — the 7-point operator (diag + sf) E - sum_d (AH E+ +
                AL E-) in one pass per CG iteration.

Both use wrap-around neighbor semantics (matching the jnp path's
`jnp.roll`); physical edges are masked through the coefficients exactly
as radiation.py does, so wrapped values never contribute.  Kernels
assume 3-D uniform Cartesian widths and an unsharded node — the gate
`supported()`; everything else falls back to the jnp path.

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
    """Pallas FLD path gate: on for TPU backends, or anywhere under
    ARTEMIS_PALLAS_INTERPRET=1 (CPU correctness tests); ARTEMIS_PALLAS=0
    or ARTEMIS_PALLAS_RAD=0 force the jnp path."""
    if os.environ.get("ARTEMIS_PALLAS", "1") == "0":
        return False
    if os.environ.get("ARTEMIS_PALLAS_RAD", "1") == "0":
        return False
    if _interpret_mode():
        return True
    return jax.default_backend() != "cpu"


def _pick_tz(nz):
    for t in (16, 8, 4, 2):
        if nz % t == 0 and nz >= t:
            return t
    return 1


def _roll(a, shift, axis):
    """In-VMEM cyclic shift (wrap semantics = the jnp path's roll;
    jnp.roll lowers to Mosaic's lane/sublane rotate inside kernels)."""
    return jnp.roll(a, shift, axis=axis)


def _coeffs_kernel(dt_ref, e_hbm, chi_hbm, a_ref, dg_ref, dc_ref, eslab,
                   cslab, sems, *, nz, ny, nx, tz, dxs, c_code, ext,
                   flags, tiny):
    i = pl.program_id(0)
    z0 = i * tz
    # modular z-halo DMAs: rows [z0-2, z0+tz+2) wrap like jnp.roll
    regs = [((z0 - 2) % nz, 2, 0), (z0, tz, 2), ((z0 + tz) % nz, 2, 2 + tz)]
    dmas = []
    for k, (zs, zn, zd) in enumerate(regs):
        for src, dst, s0 in ((e_hbm, eslab, 0), (chi_hbm, cslab, 3)):
            dma = pltpu.make_async_copy(
                src.at[pl.ds(zs, zn)], dst.at[pl.ds(zd, zn)],
                sems.at[s0 + k])
            dma.start()
            dmas.append(dma)
    for dma in dmas:
        dma.wait()

    dt = dt_ref[0]
    E = eslab[...]
    chi = cslab[...]
    idx, idy, idz = (1.0 / dxs[0], 1.0 / dxs[1], 1.0 / dxs[2])
    # gradient-magnitude rows [1, tz+3) (cells z0-1 .. z0+tz)
    gx = (_roll(E, -1, 2) - _roll(E, 1, 2)) * (0.5 * idx)
    gy = (_roll(E, -1, 1) - _roll(E, 1, 1)) * (0.5 * idy)
    gz = (E[2:] - E[:-2]) * (0.5 * idz)          # rows 1..tz+2
    g2 = gx[1:tz + 3] ** 2 + gy[1:tz + 3] ** 2 + gz ** 2
    Em = E[1:tz + 3]
    ch = chi[1:tz + 3]
    R = jnp.sqrt(g2) / (ch * jnp.maximum(Em, tiny) + tiny)
    lam = (2.0 + R) / (6.0 + 3.0 * R + R * R)
    Dc = c_code * lam / (ch + tiny)
    Dc = jnp.minimum(Dc, c_code * ext)           # FLD validity cap
    Dout = Dc[1:tz + 1]                          # cells z0 .. z0+tz

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
    tiny = float(jnp.finfo(E.dtype).tiny)
    kern = functools.partial(
        _coeffs_kernel, nz=nz, ny=ny, nx=nx, tz=tz,
        dxs=tuple(float(v) for v in dxs), c_code=float(c_code),
        ext=float(ext), flags=tuple(tuple(f) for f in flags), tiny=tiny)
    nzb = nz // tz
    blk = lambda c: pl.BlockSpec((c, tz, ny, nx), lambda i: (0, i, 0, 0),
                                 memory_space=pltpu.VMEM)
    A, dg, dc = pl.pallas_call(
        kern,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(blk(6), pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0),
                                        memory_space=pltpu.VMEM),
                   pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((6, nz, ny, nx), E.dtype),
                   jax.ShapeDtypeStruct((nz, ny, nx), E.dtype),
                   jax.ShapeDtypeStruct((nz, ny, nx), E.dtype)),
        scratch_shapes=[
            pltpu.VMEM((tz + 4, ny, nx), E.dtype),
            pltpu.VMEM((tz + 4, ny, nx), E.dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(dt, E.dtype), (1,)), E, chi)
    return A, dg, dc


def _matvec_kernel(e_hbm, a_ref, dg_ref, sf_ref, out_ref, eslab, sems, *,
                   nz, ny, nx, tz):
    i = pl.program_id(0)
    z0 = i * tz
    regs = [((z0 - 1) % nz, 1, 0), (z0, tz, 1), ((z0 + tz) % nz, 1, 1 + tz)]
    dmas = []
    for k, (zs, zn, zd) in enumerate(regs):
        dma = pltpu.make_async_copy(e_hbm.at[pl.ds(zs, zn)],
                                    eslab.at[pl.ds(zd, zn)], sems.at[k])
        dma.start()
        dmas.append(dma)
    for dma in dmas:
        dma.wait()
    E = eslab[...]
    Ec = E[1:tz + 1]
    out = (dg_ref[...] + sf_ref[...]) * Ec
    out = out - a_ref[1] * _roll(Ec, -1, 2) - a_ref[0] * _roll(Ec, 1, 2)
    out = out - a_ref[3] * _roll(Ec, -1, 1) - a_ref[2] * _roll(Ec, 1, 1)
    out = out - a_ref[5] * E[2:tz + 2] - a_ref[4] * E[:tz]
    out_ref[...] = out


def fld_matvec(E, A, diag_geo, sf, interpret=None):
    """(diag_geo + sf) E - sum_d (AH_d E_+d + AL_d E_-d) in one pass."""
    if interpret is None:
        interpret = _interpret_mode()
    nz, ny, nx = E.shape
    tz = _pick_tz(nz)
    nzb = nz // tz
    kern = functools.partial(_matvec_kernel, nz=nz, ny=ny, nx=nx, tz=tz)
    out = pl.pallas_call(
        kern,
        grid=(nzb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((6, tz, ny, nx), lambda i: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tz, ny, nx), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nz, ny, nx), E.dtype),
        scratch_shapes=[
            pltpu.VMEM((tz + 2, ny, nx), E.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM),
        interpret=interpret,
    )(E, A, diag_geo, sf)
    return out
