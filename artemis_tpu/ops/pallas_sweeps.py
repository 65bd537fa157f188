"""Fused Pallas sweep kernels for the hot flux path.

The jnp flux path materializes the reconstructed L/R states in HBM between
the reconstruction and Riemann stages.  These kernels fuse PLM + HLLC into a
single VMEM-resident pass per direction (the TPU equivalent of the
reference's team-scratch sweeps, fluid_fluxes.hpp:107-210): each grid block
DMAs a pencil of primitives into VMEM, reconstructs, solves the Riemann
problem, and writes only the fluxes back.

Scope (fast path; ops.hydro falls back to the jnp path otherwise):
Cartesian, single-species gas, PLM or PCM reconstruction, HLLC solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TINY = 1.0e-20


def _plm(qm, q0, qp):
    dql = q0 - qm
    dqr = qp - q0
    dq2 = dql * dqr
    dqm = jnp.where(dq2 > 0.0, dq2 / jnp.where(dq2 > 0.0, dql + dqr, 1.0), 0.0)
    return q0 + dqm, q0 - dqm


def _hllc(wl, wr, ivx, ivy, ivz, gamma):
    """HLLC flux rows from L/R state tuples (cf. ops.riemann.hllc)."""
    dl, dr = wl[0], wr[0]
    vxl, vxr = wl[ivx], wr[ivx]
    vyl, vyr = wl[ivy], wr[ivy]
    vzl, vzr = wl[ivz], wr[ivz]
    pl_, pr_ = wl[4], wr[4]
    sel, ser = wl[5], wr[5]

    gm1 = gamma - 1.0
    igm1 = 1.0 / gm1
    alpha = (gamma + 1.0) / (2.0 * gamma)

    # one rsqrt per side feeds the sound speeds and the face-velocity
    # reciprocal; shared denominators (ml+mr, am-bm, bp-am) are inverted
    # once — replaces 7 tile divisions with 3 reciprocals + multiplies
    isq_l = jax.lax.rsqrt(dl)
    isq_r = jax.lax.rsqrt(dr)
    al = jnp.sqrt(gamma * pl_) * isq_l
    ar = jnp.sqrt(gamma * pr_) * isq_r
    el = pl_ * igm1 + 0.5 * dl * (vxl**2 + vyl**2 + vzl**2)
    er = pr_ * igm1 + 0.5 * dr * (vxr**2 + vyr**2 + vzr**2)
    cbar = 0.25 * (dl + dr) * (al + ar)
    pmid = 0.5 * (pl_ + pr_ + (vxl - vxr) * cbar)
    ql = jnp.where(pmid <= pl_, 1.0, jnp.sqrt(1.0 + alpha * (pmid / pl_ - 1.0)))
    qr = jnp.where(pmid <= pr_, 1.0, jnp.sqrt(1.0 + alpha * (pmid / pr_ - 1.0)))
    sl = vxl - al * ql
    sr = vxr + ar * qr
    bp = jnp.where(sr > 0.0, sr, TINY)
    bm = jnp.where(sl < 0.0, sl, -TINY)
    tl = pl_ + (vxl - sl) * dl * vxl
    tr = pr_ + (vxr - sr) * dr * vxr
    ml = dl * (vxl - sl)
    mr = -(dr * (vxr - sr))
    imlr = 1.0 / (ml + mr)
    am = (tl - tr) * imlr
    cp = jnp.maximum((ml * tr + mr * tl) * imlr, 0.0)
    qe = dl * (vxl - bm)
    qf = dr * (vxr - bp)
    fle = el * (vxl - bm) + pl_ * vxl
    fre = er * (vxr - bp) + pr_ * vxr
    pos = am >= 0.0
    iamb = 1.0 / (am - bm)
    ibpa = 1.0 / (bp - am)
    wc_l = jnp.where(pos, am * iamb, 0.0)
    wc_r = jnp.where(pos, 0.0, -am * ibpa)
    wc_c = jnp.where(pos, -bm * iamb, bp * ibpa)
    pface = wc_l * pl_ + wc_r * pr_ + wc_c * cp
    frho = wc_l * qe + wc_r * qf
    fmx = wc_l * qe * vxl + wc_r * qf * vxr
    fmy = wc_l * qe * vyl + wc_r * qf * vyr
    fmz = wc_l * qe * vzl + wc_r * qf * vzr
    fen = wc_l * fle + wc_r * fre + wc_c * cp * am
    upw = frho >= 0.0
    feint = frho * jnp.where(upw, sel, ser)
    vface = frho * jnp.where(upw, isq_l * isq_l, isq_r * isq_r)
    out = [None] * 6
    out[0] = frho
    out[ivx] = fmx
    out[ivy] = fmy
    out[ivz] = fmz
    out[4] = fen
    out[5] = feint
    return out, pface, vface


def _hlle(wl, wr, ivx, ivy, ivz, gamma):
    """HLLE flux rows from L/R state tuples (cf. ops.riemann.hlle:
    Roe-averaged wavespeeds, hlle.hpp:95-220)."""
    dl, dr = wl[0], wr[0]
    vxl, vxr = wl[ivx], wr[ivx]
    vyl, vyr = wl[ivy], wr[ivy]
    vzl, vzr = wl[ivz], wr[ivz]
    pl_, pr_ = wl[4], wr[4]
    sel, ser = wl[5], wr[5]

    gm1 = gamma - 1.0
    igm1 = 1.0 / gm1
    # one rsqrt per side feeds sqrt(d), 1/sqrt(d) and the sound speeds —
    # replaces four tile divisions with multiplies
    isq_l = jax.lax.rsqrt(dl)
    isq_r = jax.lax.rsqrt(dr)
    sqrtdl = dl * isq_l
    sqrtdr = dr * isq_r
    isdlpdr = 1.0 / (sqrtdl + sqrtdr)
    wroe_vx = (sqrtdl * vxl + sqrtdr * vxr) * isdlpdr
    wroe_vy = (sqrtdl * vyl + sqrtdr * vyr) * isdlpdr
    wroe_vz = (sqrtdl * vzl + sqrtdr * vzr) * isdlpdr
    el = pl_ * igm1 + 0.5 * dl * (vxl**2 + vyl**2 + vzl**2)
    er = pr_ * igm1 + 0.5 * dr * (vxr**2 + vyr**2 + vzr**2)
    hroe = ((el + pl_) * isq_l + (er + pr_) * isq_r) * isdlpdr
    qa = jnp.sqrt(gamma * pl_) * isq_l
    qb = jnp.sqrt(gamma * pr_) * isq_r
    a2 = hroe - 0.5 * (wroe_vx**2 + wroe_vy**2 + wroe_vz**2)
    a = jnp.sqrt(gm1 * jnp.maximum(a2, 0.0))
    sl = jnp.minimum(wroe_vx - a, vxl - qa)
    sr = jnp.maximum(wroe_vx + a, vxr + qb)
    bp = jnp.where(sr > 0.0, sr, TINY)
    bm = jnp.where(sl < 0.0, sl, -TINY)
    qa_ = vxl - bm
    qb_ = vxr - bp
    fl_d = dl * qa_
    fr_d = dr * qb_
    w = jnp.where(bp != bm, 0.5 * (bp + bm) / (bp - bm), 0.0)
    frho = 0.5 * (fl_d + fr_d) + w * (fl_d - fr_d)
    fmx = 0.5 * (fl_d * vxl + fr_d * vxr) + w * (fl_d * vxl - fr_d * vxr)
    fmy = 0.5 * (fl_d * vyl + fr_d * vyr) + w * (fl_d * vyl - fr_d * vyr)
    fmz = 0.5 * (fl_d * vzl + fr_d * vzr) + w * (fl_d * vzl - fr_d * vzr)
    fl_e = el * qa_ + pl_ * vxl
    fr_e = er * qb_ + pr_ * vxr
    fen = 0.5 * (fl_e + fr_e) + w * (fl_e - fr_e)
    upw = frho >= 0.0
    feint = frho * jnp.where(upw, sel, ser)
    vface = frho * jnp.where(upw, isq_l * isq_l, isq_r * isq_r)
    pface = 0.5 * (pl_ + pr_) + w * (pl_ - pr_)
    out = [None] * 6
    out[0] = frho
    out[ivx] = fmx
    out[ivy] = fmy
    out[ivz] = fmz
    out[4] = fen
    out[5] = feint
    return out, pface, vface


RIEMANN = {"hllc": _hllc, "hlle": _hlle}


def _sweep_kernel(w_ref, f_ref, pf_ref, vf_ref, *, axis, ddir, ng, nfaces, pcm, gamma):
    """Fused PLM+HLLC sweep along ``axis`` of the VMEM block.

    w_ref: [6, ...] with ghosts along ``axis``; face outputs sized nfaces.
    """
    w = w_ref[...]

    def shift(s0, s1):
        sl = [slice(None)] * w.ndim
        sl[axis] = slice(s0, s1)
        return w[tuple(sl)]

    n_ax = w.shape[axis]
    if pcm:
        ql = shift(0, n_ax)
        qr = ql
        # wl[f] = cell f-1, wr[f] = cell f; faces ng..ng+nfaces-1
        def fsl(a, off):
            sl = [slice(None)] * w.ndim
            sl[axis] = slice(off, off + nfaces)
            return a[tuple(sl)]
        wl = fsl(ql, ng - 1)
        wr = fsl(qr, ng)
    else:
        qm = shift(0, n_ax - 2)
        q0 = shift(1, n_ax - 1)
        qp = shift(2, n_ax)
        ql, qr = _plm(qm, q0, qp)  # values at cell index i = 1..n_ax-2

        def fsl(a, off):
            sl = [slice(None)] * ql.ndim
            sl[axis] = slice(off, off + nfaces)
            return a[tuple(sl)]
        # face f (abs index ng..): wl from cell f-1 -> ql index (f-1)-1
        wl = fsl(ql, ng - 2)
        wr = fsl(qr, ng - 1)

    ivx = ddir
    ivy = (ddir % 3) + 1
    ivz = ((ddir + 1) % 3) + 1
    wl_t = tuple(wl[c] for c in range(6))
    wr_t = tuple(wr[c] for c in range(6))
    F, pface, vface = _hllc(wl_t, wr_t, ivx, ivy, ivz, gamma)
    f_ref[...] = jnp.stack(F, axis=0)
    pf_ref[...] = pface
    vf_ref[...] = vface


def sweep(w_pad, d, grid, gamma, recon="plm"):
    """Fused sweep over direction d; returns (F, pF, vF) on interior faces.

    w_pad: [1, 6, zp, yp, xp] padded primitives.
    """
    ng = grid.ng
    nx, ny, nz = grid.nx
    g1, g2, g3 = ng
    w = w_pad[0]
    # restrict the transverse dims to the interior before the kernel
    if d == 1:
        w_in = w[:, g3:g3 + nz, g2:g2 + ny, :]
        nfaces = nx + 1
        out_shape = (6, nz, ny, nfaces)
        axis = 3
        blk_in = (6, 1, 8, w_in.shape[3])
        blk_out = (6, 1, 8, nfaces)
        grid_dims = (nz, max(1, ny // 8))
        imap = lambda i, j: (0, i, j, 0)
    elif d == 2:
        w_in = w[:, g3:g3 + nz, :, g1:g1 + nx]
        nfaces = ny + 1
        out_shape = (6, nz, nfaces, nx)
        axis = 2
        tx = 128 if nx % 128 == 0 else nx
        blk_in = (6, 1, w_in.shape[2], tx)
        blk_out = (6, 1, nfaces, tx)
        grid_dims = (nz, max(1, nx // tx))
        imap = lambda i, j: (0, i, 0, j)
    else:
        # z sweep: transpose so z becomes the lane dimension (a block with
        # the full ghosted z extent as lanes fits VMEM; a (z, y, x)-layout
        # block carrying the full z extent would not)
        w_in = jnp.transpose(w[:, :, g2:g2 + ny, g1:g1 + nx], (0, 2, 3, 1))
        nfaces = nz + 1
        out_shape = (6, ny, nx, nfaces)
        axis = 3
        blk_in = (6, 1, 8, w_in.shape[3])
        blk_out = (6, 1, 8, nfaces)
        grid_dims = (ny, max(1, nx // 8))
        imap = lambda i, j: (0, i, j, 0)

    gax = {1: g1, 2: g2, 3: g3}[d]
    kern = functools.partial(_sweep_kernel, axis=axis, ddir=d, ng=gax,
                             nfaces=nfaces, pcm=(recon == "pcm"), gamma=gamma)
    dt = w_in.dtype
    F, pF, vF = pl.pallas_call(
        kern,
        grid=grid_dims,
        in_specs=[pl.BlockSpec(blk_in, imap, memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(blk_out, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_out[1:], lambda i, j: imap(i, j)[1:],
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk_out[1:], lambda i, j: imap(i, j)[1:],
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(out_shape, dt),
            jax.ShapeDtypeStruct(out_shape[1:], dt),
            jax.ShapeDtypeStruct(out_shape[1:], dt),
        ),
    )(w_in)
    if d == 3:  # transpose the face arrays back to [.., z-faces, y, x]
        F = jnp.transpose(F, (0, 3, 1, 2))
        pF = jnp.transpose(pF, (2, 0, 1))
        vF = jnp.transpose(vF, (2, 0, 1))
    return F[None], pF[None], vF[None]


def supported(grid, cfg) -> bool:
    """Is the fused fast path applicable?"""
    import jax as _jax

    try:
        on_tpu = _jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False
    return (on_tpu and grid.coords == "cartesian" and cfg.fluid == "gas"
            and cfg.nspecies == 1 and cfg.rsolver == "hllc"
            and cfg.recon in ("plm", "pcm")
            and grid.nx[1] % 8 == 0 and grid.nx[2] >= 1)
