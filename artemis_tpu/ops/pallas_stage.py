"""Fused whole-stage Pallas kernel for Cartesian gas hydro.

One kernel performs, per (z-plane, y-tile) block, everything between the
ghost fill and the next stage: PLM(+PCM) reconstruction and HLLC fluxes in
all active directions, the two-register RK flux-divergence update
(ApplyUpdate, artemis_integrator.hpp:56-110), the pressure-gradient + PdV
flux sources (FluxSourceImpl, fluid_fluxes.hpp:295-420, Cartesian branch),
the dual-energy sync (SetAuxillaryFields), and the C2P/P2C floor re-sync
(fill_derived.cpp) — writing only the new conserved + primitive interior
arrays.  The jnp path materializes each of those intermediates in HBM;
fusing them removes ~6 full-array HBM round trips per stage.

Halos: the y/z neighborhoods overlap between blocks, which Pallas block
index maps cannot express, so the padded primitives stay in HBM
(memory_space=ANY) and each block DMAs its (z-tile±2, y-tile±2, full-x)
slab into a VMEM scratch buffer explicitly.  Mosaic requires HBM DMA
slices 8-aligned on the sublane (y) dim, so the y slab is rounded up to
24 rows (the last 4 are unused) and the padded array carries 4 spare
rows at the top.

Scope (fast path; the driver falls back to the composable jnp path
otherwise): Cartesian, single-species gas, PLM/PCM + HLLC, 2-ghost, ny a
multiple of 16, nz a multiple of 4 (or 2-D), no external sources /
diffusion on the stage.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_sweeps import _hllc, _plm

TY = 16  # y rows per block
TZ = 4   # z planes per block


def _yslab(hs: int) -> int:
    """DMA'd y-slab rows: TY + 2*hs halo, rounded up to the 8-row tiling."""
    return -(-(TY + 2 * hs) // 8) * 8


def rk_blend(u0_ref, u1_ref, gam0, gam1, divf, bdt, lead=False):
    """gam0*u0 + gam1*u1 + bdt*divF with statically-zero/one coefficients
    elided.  Stage 1 of every integrator (and both vl2 stages) has
    gam0 == 0: the u0 register is then a dummy block whose HBM fetch the
    frontends skip entirely (``rk_register_blocks``).  Bit-identical to
    the dense form for finite inputs (0.0*x + y == y, 1.0*x == x).
    ``lead=True``: the register blocks carry a leading node axis of 1
    (node-batched kernels)."""
    u0 = u0_ref[...] if gam0 != 0.0 else None
    u1 = u1_ref[...] if gam1 != 0.0 else None
    if lead:
        u0 = u0[0] if u0 is not None else None
        u1 = u1[0] if u1 is not None else None
    out = []
    for c in range(len(divf)):
        acc = None
        if gam0 != 0.0:
            acc = u0[c] if gam0 == 1.0 else gam0 * u0[c]
        if gam1 != 0.0:
            t = u1[c] if gam1 == 1.0 else gam1 * u1[c]
            acc = t if acc is None else acc + t
        t = bdt * divf[c]
        out.append(t if acc is None else acc + t)
    return out


def rk_register_blocks(u0_, u1_, gam0, gam1, blk, imap, dt):
    """(u0, u1, spec0, spec1) for the two RK register inputs: a register
    whose static coefficient is 0.0 is replaced by a tiny dummy block so
    the pallas pipeline never fetches the dead full-size array."""
    live = pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM)
    if gam0 != 0.0 and gam1 != 0.0:
        return u0_, u1_, live, live
    dead = pl.BlockSpec((6, 1, 1, 128), lambda i, j: (0, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    dummy = jnp.zeros((6, 1, 1, 128), dt)
    if gam0 == 0.0:
        u0_ = dummy
    if gam1 == 0.0:
        u1_ = dummy
    return (u0_, u1_, dead if gam0 == 0.0 else live,
            dead if gam1 == 0.0 else live)


def _lr_faces(q, axis, lo, count, method):
    """L/R face states for ``count`` faces starting at padded face index
    ``lo`` along ``axis`` (face f sits between cells f-1 and f)."""

    def sl(a, start, num):
        s = [slice(None)] * a.ndim
        s[axis] = slice(start, start + num)
        return a[tuple(s)]

    if method == "pcm":
        return sl(q, lo - 1, count), sl(q, lo, count)
    n = q.shape[axis]
    if method == "ppm":
        # PPM4 (Colella & Woodward; cf. ops/recon.ppm4 and the reference
        # src/utils/fluxes/reconstruction/ppm.hpp:32-66); cells 2..n-3
        # (index = cell-2), needs a 3-cell halo
        qm2 = sl(q, 0, n - 4)
        qm1 = sl(q, 1, n - 4)
        q0 = sl(q, 2, n - 4)
        qp1 = sl(q, 3, n - 4)
        qp2 = sl(q, 4, n - 4)
        qlv = (7.0 * (q0 + qm1) - (qm2 + qp1)) / 12.0
        qrv = (7.0 * (q0 + qp1) - (qm1 + qp2)) / 12.0
        qlv = jnp.clip(qlv, jnp.minimum(q0, qm1), jnp.maximum(q0, qm1))
        qrv = jnp.clip(qrv, jnp.minimum(q0, qp1), jnp.maximum(q0, qp1))
        qc = qrv - q0
        qd = qlv - q0
        flat = (qc * qd) >= 0.0
        qrv = jnp.where(flat, q0, jnp.where(
            jnp.abs(qc) >= 2.0 * jnp.abs(qd), q0 - 2.0 * qd, qrv))
        qlv = jnp.where(flat, q0, jnp.where(
            jnp.abs(qd) >= 2.0 * jnp.abs(qc), q0 - 2.0 * qc, qlv))
        # face f: wl = qrv of cell f-1 (index f-3), wr = qlv of cell f
        return sl(qrv, lo - 3, count), sl(qlv, lo - 2, count)
    qm = sl(q, 0, n - 2)
    q0 = sl(q, 1, n - 2)
    qp = sl(q, 2, n - 2)
    ql, qr = _plm(qm, q0, qp)  # defined on cells 1..n-2 (index = cell-1)
    return sl(ql, lo - 2, count), sl(qr, lo - 1, count)


def _stage_kernel(bdt_ref, u0_ref, u1_ref, wp_hbm, u_ref, w_ref, dm_ref,
                  scratch, sem, *, ng, nx, tz, active_z, method, gamma,
                  gam0, gam1, dx, dy, dz, dfloor, siefloor, de_switch, hs):
    i = pl.program_id(0)
    j = pl.program_id(1)
    zsz = tz + 2 * hs if active_z else 1
    dma = pltpu.make_async_copy(
        wp_hbm.at[:, pl.ds(i * tz, zsz), pl.ds(j * TY, _yslab(hs)), :],
        scratch, sem)
    dma.start()
    bdt = bdt_ref[0]
    dma.wait()
    s = scratch[...][:, :, :TY + 2 * hs]  # [6, zsz, TY+2hs, xp]

    def hllc6(wl, wr, d):
        ivx = d
        ivy = (d % 3) + 1
        ivz = ((d + 1) % 3) + 1
        F, pf, vf = _hllc(tuple(wl[c] for c in range(6)),
                          tuple(wr[c] for c in range(6)), ivx, ivy, ivz, gamma)
        return F, pf, vf

    zc = slice(hs, hs + tz) if active_z else slice(0, 1)

    def ax(a, axis, s0, s1):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(s0, s1)
        return a[tuple(sl)]

    # ---- X fluxes: [tz, TY, nx+1] on interior z planes / y rows
    wx = s[:, zc, hs:hs + TY, :]
    wl, wr = _lr_faces(wx, 3, ng, nx + 1, method)
    Fx, pfx, vfx = hllc6(wl, wr, 1)

    # ---- Y fluxes: [tz, TY+1, nx]
    wy = s[:, zc, :, ng:ng + nx]
    wl, wr = _lr_faces(wy, 2, hs, TY + 1, method)
    Fy, pfy, vfy = hllc6(wl, wr, 2)

    # ---- Z fluxes: [tz+1, TY, nx]
    if active_z:
        wz = s[:, :, hs:hs + TY, ng:ng + nx]
        wl, wr = _lr_faces(wz, 1, hs, tz + 1, method)
        Fz, pfz, vfz = hllc6(wl, wr, 3)

    idx, idy, idz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    divf = [(ax(Fx[c], 2, 0, nx) - ax(Fx[c], 2, 1, nx + 1)) * idx
            + (ax(Fy[c], 1, 0, TY) - ax(Fy[c], 1, 1, TY + 1)) * idy
            for c in range(6)]
    if active_z:
        divf = [divf[c] + (ax(Fz[c], 0, 0, tz) - ax(Fz[c], 0, 1, tz + 1)) * idz
                for c in range(6)]
    u = rk_blend(u0_ref, u1_ref, gam0, gam1, divf, bdt)

    # pressure-gradient force + PdV work (FluxSourceImpl, Cartesian)
    pxl, pxh = ax(pfx, 2, 0, nx), ax(pfx, 2, 1, nx + 1)
    vxl, vxh = ax(vfx, 2, 0, nx), ax(vfx, 2, 1, nx + 1)
    pyl, pyh = ax(pfy, 1, 0, TY), ax(pfy, 1, 1, TY + 1)
    vyl, vyh = ax(vfy, 1, 0, TY), ax(vfy, 1, 1, TY + 1)
    u[1] = u[1] + (bdt * idx) * (pxl - pxh)
    u[2] = u[2] + (bdt * idy) * (pyl - pyh)
    u[5] = u[5] - (bdt * idx) * 0.5 * (pxl + pxh) * (vxh - vxl)
    u[5] = u[5] - (bdt * idy) * 0.5 * (pyl + pyh) * (vyh - vyl)
    if active_z:
        pzl, pzh = ax(pfz, 0, 0, tz), ax(pfz, 0, 1, tz + 1)
        vzl, vzh = ax(vfz, 0, 0, tz), ax(vfz, 0, 1, tz + 1)
        u[3] = u[3] + (bdt * idz) * (pzl - pzh)
        u[5] = u[5] - (bdt * idz) * 0.5 * (pzl + pzh) * (vzh - vzl)

    # dual-energy sync (SetAuxillaryFields); one tile reciprocal feeds
    # the kinetic energy, dual-energy switch and C2P velocities
    rho = jnp.maximum(u[0], dfloor)
    irho = 1.0 / rho
    ke = 0.5 * (u[1] ** 2 + u[2] ** 2 + u[3] ** 2) * irho
    ue = u[4] - ke
    sie = jnp.where(ue > de_switch * u[4], ue * irho, u[5] * irho)
    sie = jnp.maximum(sie, siefloor)
    u[5] = jnp.maximum(sie * rho, siefloor * rho)

    # C2P + P2C floor re-sync (fill_derived.cpp)
    v1 = u[1] * irho
    v2 = u[2] * irho
    v3 = u[3] * irho
    sie = jnp.maximum(u[5] * irho, siefloor)
    p = (gamma - 1.0) * rho * sie
    eint = sie * rho
    etot = eint + 0.5 * rho * (v1 * v1 + v2 * v2 + v3 * v3)

    u_ref[...] = jnp.stack([rho, rho * v1, rho * v2, rho * v3, etot, eint])
    w_ref[...] = jnp.stack([rho, v1, v2, v3, p, sie])

    # fused CFL denominator (EstimateTimestepMesh): block max of
    # sum_d (|v_d|+cs)/dx_d -> dt = cfl / global max
    cs = jnp.sqrt(gamma * (gamma - 1.0) * sie)
    den = (jnp.abs(v1) + cs) * idx + (jnp.abs(v2) + cs) * idy
    if active_z:
        den = den + (jnp.abs(v3) + cs) * idz
    dm_ref[pl.program_id(0), pl.program_id(1)] = jnp.max(den)


def stage(w_pad, u0, u1, grid, cfg, gam0, gam1, beta_dt, force_pcm,
          interpret=None):
    """Run one fused RK stage.  Returns (u_new, w_new) interior arrays."""
    if interpret is None:
        interpret = _interpret_mode()
    nx, ny, nz = grid.nx
    g1, g2, g3 = grid.ng
    active_z = nz > 1
    wp = w_pad[0]          # [6, zp, yp, xp]
    u0_ = u0[0]
    u1_ = u1[0]
    g = grid.geom
    dx = float(g.xf1[1] - g.xf1[0])
    dy = float(g.xf2[1] - g.xf2[0])
    dz = float(g.xf3[1] - g.xf3[0])
    method = "pcm" if (force_pcm or cfg.recon == "pcm") else cfg.recon
    hs = g1  # slab halo width = nghost (>= 3 for ppm)

    tz = TZ if active_z else 1
    kern = functools.partial(
        _stage_kernel, ng=g1, nx=nx, tz=tz, active_z=active_z, method=method,
        gamma=cfg.gamma, gam0=gam0, gam1=gam1, dx=dx, dy=dy, dz=dz,
        dfloor=cfg.dfloor, siefloor=cfg.siefloor, de_switch=cfg.de_switch,
        hs=hs)
    dt = wp.dtype
    zsz = tz + 2 * hs if active_z else 1
    # the y DMA slab is _yslab(hs) rows; give the padded array the spare
    # rows the top-edge block reads (values unused).  Mosaic also requires
    # HBM DMA slices 128-aligned on the lane (x) dim, so pad x to the next
    # multiple of 128 and DMA full rows (the tail lanes are unused).
    xp_al = -(-wp.shape[-1] // 128) * 128
    wp = jnp.pad(wp, [(0, 0), (0, 0), (0, _yslab(hs) - (TY + 2 * hs)),
                      (0, xp_al - wp.shape[-1])])
    blk = (6, tz, TY, nx)
    imap = lambda i, j: (0, i, j, 0)
    u0_, u1_, spec0, spec1 = rk_register_blocks(u0_, u1_, gam0, gam1, blk,
                                                imap, dt)
    u_new, w_new, dmax = pl.pallas_call(
        kern,
        grid=(nz // tz, ny // TY),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # bdt (1,)
            spec0,                                   # u0 (dummy if gam0=0)
            spec1,                                   # u1 (dummy if gam1=0)
            pl.BlockSpec(memory_space=pl.ANY),    # wp (manual DMA)
        ],
        out_specs=(
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dmax, full blocks array
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((nz // tz, ny // TY), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, zsz, _yslab(hs), wp.shape[-1]), dt),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(beta_dt, dt), (1,)), u0_, u1_, wp)
    return u_new[None], w_new[None], dmax


def _interpret_mode() -> bool:
    """ARTEMIS_PALLAS_INTERPRET=1: run the fused kernels in interpreter mode
    on non-TPU backends (testing the fused paths on the virtual CPU mesh)."""
    import os

    return os.environ.get("ARTEMIS_PALLAS_INTERPRET") == "1"


def supported(grid, cfg) -> bool:
    """Is the fused whole-stage path applicable?"""
    import os

    if os.environ.get("ARTEMIS_PALLAS", "1") == "0":
        return False
    try:
        on_tpu = jax.devices()[0].platform == "tpu" or _interpret_mode()
    except Exception:  # pragma: no cover
        return False
    ghost_ok = (grid.nghost == 2 if cfg is None or cfg.recon in ("plm", "pcm")
                else grid.nghost in (3, 4))  # ppm needs a 3-cell halo
    return (on_tpu and grid.coords == "cartesian" and cfg is not None
            and cfg.fluid == "gas" and cfg.nspecies == 1
            and cfg.rsolver == "hllc"
            and cfg.recon in ("plm", "pcm", "ppm")
            and ghost_ok and grid.nx[1] % TY == 0
            and (grid.nx[2] == 1 or grid.nx[2] % TZ == 0)
            and grid.nx[1] > 1 and grid.nx[0] > 1)


# ---------------------------------------------------------------------------
# periodic fast path: no padded array at all — each block gathers its own
# (z, y) halos with 9 aligned DMAs from the unpadded interior array and
# wraps x inside VMEM.  Removes the HBM pad round-trip entirely.
# ---------------------------------------------------------------------------
import os as _os

TZP = int(_os.environ.get("ARTEMIS_CART_TZ", "8"))   # z planes per block
TYP = int(_os.environ.get("ARTEMIS_CART_TY", "32"))  # y rows per block


def _stage_kernel_periodic(bdt_ref, u0_ref, u1_ref, w_hbm, u_ref, w_ref,
                           dm_ref, scratch, sems, *, nx, ny, nz, tz, ty,
                           active_z, method, gamma, gam0, gam1, dx, dy, dz,
                           dfloor, siefloor, de_switch, hs):
    i = pl.program_id(0)
    j = pl.program_id(1)
    z0 = i * tz
    y0 = j * ty

    # (z-region, y-region) → contiguous slab DMA.  Halo regions are hs
    # planes in z (no alignment constraint) and 8 rows in y (sublane
    # tiling; hs <= 8 of them are used).
    if active_z:
        zregs = [((z0 - hs) % nz, hs, 0), (z0, tz, hs),
                 ((z0 + tz) % nz, hs, hs + tz)]
    else:
        zregs = [(0, 1, 0)]
    # modular halo offsets are all multiples of 8; Mosaic needs the hint
    yregs = [(pl.multiple_of((y0 - 8) % ny, 8), 8, 0),
             (pl.multiple_of(y0, 8), ty, 8),
             (pl.multiple_of((y0 + ty) % ny, 8), 8, 8 + ty)]
    dmas = []
    for a, (zs, zn, zd) in enumerate(zregs):
        for b, (ys, yn, yd) in enumerate(yregs):
            dma = pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(zs, zn), pl.ds(ys, yn), :],
                scratch.at[:, pl.ds(zd, zn), pl.ds(yd, yn), :],
                sems.at[a, b])
            dma.start()
            dmas.append(dma)
    bdt = bdt_ref[0]
    for dma in dmas:
        dma.wait()

    # used window: y rows (8-hs) .. ty+8+hs (hs-halo), x wrapped in VMEM
    s = scratch[...][:, :, 8 - hs:ty + 8 + hs]
    s = jnp.concatenate([s[..., nx - hs:], s, s[..., :hs]], axis=-1)

    def hllc6(wl, wr, d):
        ivx = d
        ivy = (d % 3) + 1
        ivz = ((d + 1) % 3) + 1
        F, pf, vf = _hllc(tuple(wl[c] for c in range(6)),
                          tuple(wr[c] for c in range(6)), ivx, ivy, ivz, gamma)
        return F, pf, vf

    zc = slice(hs, hs + tz) if active_z else slice(0, 1)

    def ax(a, axis, s0, s1):
        sl = [slice(None)] * a.ndim
        sl[axis] = slice(s0, s1)
        return a[tuple(sl)]

    wx = s[:, zc, hs:hs + ty, :]
    wl, wr = _lr_faces(wx, 3, hs, nx + 1, method)
    Fx, pfx, vfx = hllc6(wl, wr, 1)

    wy = s[:, zc, :, hs:hs + nx]
    wl, wr = _lr_faces(wy, 2, hs, ty + 1, method)
    Fy, pfy, vfy = hllc6(wl, wr, 2)

    if active_z:
        wz = s[:, :, hs:hs + ty, hs:hs + nx]
        wl, wr = _lr_faces(wz, 1, hs, tz + 1, method)
        Fz, pfz, vfz = hllc6(wl, wr, 3)

    idx, idy, idz = 1.0 / dx, 1.0 / dy, 1.0 / dz
    divf = [(ax(Fx[c], 2, 0, nx) - ax(Fx[c], 2, 1, nx + 1)) * idx
            + (ax(Fy[c], 1, 0, ty) - ax(Fy[c], 1, 1, ty + 1)) * idy
            for c in range(6)]
    if active_z:
        divf = [divf[c] + (ax(Fz[c], 0, 0, tz) - ax(Fz[c], 0, 1, tz + 1)) * idz
                for c in range(6)]
    u = rk_blend(u0_ref, u1_ref, gam0, gam1, divf, bdt)

    pxl, pxh = ax(pfx, 2, 0, nx), ax(pfx, 2, 1, nx + 1)
    vxl, vxh = ax(vfx, 2, 0, nx), ax(vfx, 2, 1, nx + 1)
    pyl, pyh = ax(pfy, 1, 0, ty), ax(pfy, 1, 1, ty + 1)
    vyl, vyh = ax(vfy, 1, 0, ty), ax(vfy, 1, 1, ty + 1)
    u[1] = u[1] + (bdt * idx) * (pxl - pxh)
    u[2] = u[2] + (bdt * idy) * (pyl - pyh)
    u[5] = u[5] - (bdt * idx) * 0.5 * (pxl + pxh) * (vxh - vxl)
    u[5] = u[5] - (bdt * idy) * 0.5 * (pyl + pyh) * (vyh - vyl)
    if active_z:
        pzl, pzh = ax(pfz, 0, 0, tz), ax(pfz, 0, 1, tz + 1)
        vzl, vzh = ax(vfz, 0, 0, tz), ax(vfz, 0, 1, tz + 1)
        u[3] = u[3] + (bdt * idz) * (pzl - pzh)
        u[5] = u[5] - (bdt * idz) * 0.5 * (pzl + pzh) * (vzh - vzl)

    rho = jnp.maximum(u[0], dfloor)
    irho = 1.0 / rho
    ke = 0.5 * (u[1] ** 2 + u[2] ** 2 + u[3] ** 2) * irho
    ue = u[4] - ke
    sie = jnp.where(ue > de_switch * u[4], ue * irho, u[5] * irho)
    sie = jnp.maximum(sie, siefloor)
    u[5] = jnp.maximum(sie * rho, siefloor * rho)

    v1 = u[1] * irho
    v2 = u[2] * irho
    v3 = u[3] * irho
    sie = jnp.maximum(u[5] * irho, siefloor)
    p = (gamma - 1.0) * rho * sie
    eint = sie * rho
    etot = eint + 0.5 * rho * (v1 * v1 + v2 * v2 + v3 * v3)

    u_ref[...] = jnp.stack([rho, rho * v1, rho * v2, rho * v3, etot, eint])
    w_ref[...] = jnp.stack([rho, v1, v2, v3, p, sie])

    cs = jnp.sqrt(gamma * (gamma - 1.0) * sie)
    den = (jnp.abs(v1) + cs) * idx + (jnp.abs(v2) + cs) * idy
    if active_z:
        den = den + (jnp.abs(v3) + cs) * idz
    dm_ref[pl.program_id(0), pl.program_id(1)] = jnp.max(den)


def stage_periodic(w, u0, u1, grid, cfg, gam0, gam1, beta_dt, force_pcm,
                   interpret=None):
    """Fused RK stage for the all-periodic Cartesian case: consumes the
    UNPADDED interior primitives; halos are gathered in-kernel."""
    if interpret is None:
        interpret = _interpret_mode()
    nx, ny, nz = grid.nx
    active_z = nz > 1
    w_ = w[0]
    u0_ = u0[0]
    u1_ = u1[0]
    g = grid.geom
    dx = float(g.xf1[1] - g.xf1[0])
    dy = float(g.xf2[1] - g.xf2[0])
    dz = float(g.xf3[1] - g.xf3[0])
    method = "pcm" if (force_pcm or cfg.recon == "pcm") else cfg.recon
    hs = 3 if cfg.recon == "ppm" else 2  # in-kernel halo width
    tz = TZP if active_z else 1
    ty = TYP

    kern = functools.partial(
        _stage_kernel_periodic, nx=nx, ny=ny, nz=nz, tz=tz, ty=ty,
        active_z=active_z, method=method, gamma=cfg.gamma, gam0=gam0,
        gam1=gam1, dx=dx, dy=dy, dz=dz, dfloor=cfg.dfloor,
        siefloor=cfg.siefloor, de_switch=cfg.de_switch, hs=hs)
    dt = w_.dtype
    zsz = tz + 2 * hs if active_z else 1
    blk = (6, tz, ty, nx)
    imap = lambda i, j: (0, i, j, 0)
    u0_, u1_, spec0, spec1 = rk_register_blocks(u0_, u1_, gam0, gam1, blk,
                                                imap, dt)
    u_new, w_new, dmax = pl.pallas_call(
        kern,
        grid=(nz // tz, ny // ty),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            spec0,
            spec1,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, imap, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # dmax, full blocks array
        ),
        out_shape=(
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((6, nz, ny, nx), dt),
            jax.ShapeDtypeStruct((nz // tz, ny // ty), dt),
        ),
        scratch_shapes=[
            pltpu.VMEM((6, zsz, ty + 16, nx), dt),
            pltpu.SemaphoreType.DMA((3, 3)),
        ],
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(jnp.reshape(jnp.asarray(beta_dt, dt), (1,)), u0_, u1_, w_)
    return u_new[None], w_new[None], dmax


def dt_block_shape(grid, periodic: bool):
    """Shape of the fused-kernel dt-denominator block grid."""
    nx, ny, nz = grid.nx
    if periodic:
        tz = TZP if nz > 1 else 1
        return (nz // tz, ny // TYP)
    tz = TZ if nz > 1 else 1
    return (nz // tz, ny // TY)


def periodic_supported(grid, cfg) -> bool:
    """Is the no-pad periodic whole-stage path applicable?"""
    if not supported(grid, cfg):
        return False
    for d in range(3):
        if grid.nx[d] > 1 and (grid.bc[d][0] != "periodic"
                               or grid.bc[d][1] != "periodic"):
            return False
    return (grid.nx[1] % TYP == 0 and grid.nx[0] % 128 == 0
            and (grid.nx[2] == 1 or grid.nx[2] % TZP == 0))
