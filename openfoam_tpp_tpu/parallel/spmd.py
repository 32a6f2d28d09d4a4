"""Per-shard fused kernels under shard_map — explicit ppermute halo rings.

The GSPMD sharded path (parallel/sharding.py) is correct but pays ~20%
per chip: the fused Pallas kernels are single-device programs and pin
off under automatic partitioning, so the step runs the dense jnp path
(docs/ROADMAP.md "GSPMD-vs-fused-kernel gap": jnp 160.4M vs fused 199.5M
cell-updates/s on the same 1M-cell window). This module closes that gap
the way the reference closes it with MPI halo exchanges
(`decomposePar → mpirun -np N foamRun -parallel`,
/root/reference/circularSloshingTank/Makefile:77-82): each kernel call
site becomes a `jax.shard_map` island inside the jitted GSPMD step —
arrays enter already sharded on the grid's x axis (zero-cost entry), the
island exchanges ±1/±2 x-plane halos with `lax.ppermute` over ICI, runs
the UNCHANGED single-device kernel body per shard (halo planes fed
through dedicated inputs, ops/pallas/halo-variant entry points), and
reduces scalars with `lax.psum`/`lax.pmax`. Everything between islands
(the jnp stencil chains, MG transfers, CG recurrences) stays under GSPMD
exactly as before.

Halo-plane edge semantics at the GLOBAL domain ends reproduce each
kernel's clamped-index-map behavior: "clamp" edges replicate the edge
plane (the jnp edge-clamped shift), "zero" edges supply the implicit
zero boundary faces (sealed walls / the zeroed top antidiffusive flux).
Interior shard boundaries always carry the true neighbor planes.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class SpmdCtx:
    """Static context threaded through the solver when the step runs
    spatially sharded with per-shard fused kernels.

    `mesh` is the device mesh (parallel/sharding.make_mesh); `axis` the
    mesh-axis name sharding the grid's leading (x) dimension. `interpret`
    runs the Pallas kernels in interpreter mode — the CPU-virtual-device
    test path (kernels have no compiled CPU lowering)."""

    mesh: Mesh
    axis: str = "x"
    interpret: bool = False

    # Mesh is unhashable across processes but stable within one trace;
    # dataclass eq/hash on it is fine for jit static args because the
    # ctx is closed over, never passed as an argument.

    @property
    def n_shards(self) -> int:
        return self.mesh.shape[self.axis]

    def local_shape(self, shape):
        """Per-shard shape of a dim-0-sharded cell array."""
        nx = shape[0]
        if nx % self.n_shards:
            raise ValueError(
                f"grid nx={nx} does not divide over {self.n_shards} "
                f"'{self.axis}' shards")
        return (nx // self.n_shards,) + tuple(shape[1:])

    def supports(self, supported_fn, shape, dtype) -> bool:
        """Kernel feasibility on the PER-SHARD shape."""
        nx = shape[0]
        if nx % self.n_shards:
            return False
        return supported_fn(self.local_shape(shape), dtype)

    def smap(self, f, in_specs, out_specs):
        """shard_map over this mesh with replication checking off (the
        islands mix ppermute halo traffic with per-shard outputs; the
        varying-manual-axes checker rejects that conservatively)."""
        return jax.shard_map(f, mesh=self.mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)

    @property
    def spec(self) -> P:
        """PartitionSpec sharding dim 0 on the grid axis."""
        return P(self.axis)

    @property
    def rep(self) -> P:
        return P()


def exchange_halo(a, width: int, axis_name: str, lo_edge: str = "clamp",
                  hi_edge: str = "clamp"):
    """(lo, hi) halo blocks of `width` x-planes from the ring neighbors.

    `lo` holds the left neighbor's LAST `width` planes (ghost rows
    −width…−1 of this shard); `hi` the right neighbor's FIRST `width`
    planes (ghost rows nxl…nxl+width−1). At the global ends:
      * "clamp": the edge plane replicated — the jnp edge-clamped shift
        and the kernels' jnp.maximum/minimum index-map clamps.
      * "zero": zeros — the implicit zero boundary faces (sealed walls,
        zeroed top antidiffusive flux, rpx beyond the wall).
    ppermute leaves un-targeted destinations zero, so "zero" edges are
    free; "clamp" edges pay one select against the shard index."""
    n = lax.axis_size(axis_name)
    if n == 1:
        lo = _edge_fill(a, width, lo_edge, lo=True)
        hi = _edge_fill(a, width, hi_edge, lo=False)
        return lo, hi
    idx = lax.axis_index(axis_name)
    lo = lax.ppermute(a[-width:], axis_name,
                      [(i, i + 1) for i in range(n - 1)])
    hi = lax.ppermute(a[:width], axis_name,
                      [(i + 1, i) for i in range(n - 1)])
    if lo_edge == "clamp":
        lo = jnp.where(idx == 0, _edge_fill(a, width, "clamp", lo=True), lo)
    if hi_edge == "clamp":
        hi = jnp.where(idx == n - 1,
                       _edge_fill(a, width, "clamp", lo=False), hi)
    return lo, hi


def _edge_fill(a, width, edge, lo):
    if edge == "zero":
        return jnp.zeros((width,) + a.shape[1:], a.dtype)
    plane = a[:1] if lo else a[-1:]
    return jnp.broadcast_to(plane, (width,) + a.shape[1:])


def exchange_hi(a, width: int, axis_name: str, edge: str = "zero"):
    """One-sided halo: the right neighbor's FIRST `width` planes only
    (no lo-side ppermute — for operands whose kernels need just the
    high-x continuation, e.g. the face-lite wxl weight array)."""
    n = lax.axis_size(axis_name)
    if n == 1:
        return _edge_fill(a, width, edge, lo=False)
    hi = lax.ppermute(a[:width], axis_name,
                      [(i + 1, i) for i in range(n - 1)])
    if edge == "clamp":
        hi = jnp.where(lax.axis_index(axis_name) == n - 1,
                       _edge_fill(a, width, "clamp", lo=False), hi)
    return hi


def psum_scalar(x, axis_name):
    return lax.psum(x, axis_name)


def pmax_scalar(x, axis_name):
    return lax.pmax(x, axis_name)


# --------------------------------------------------------------------- #
# shard_map islands for each kernel family. Arrays arrive sharded on
# dim 0 (P(axis)); islands exchange halos and run the halo-variant
# kernels from ops/pallas/*. All entry points take GLOBAL arrays (inside
# the surrounding GSPMD jit) and return GLOBAL results.
# --------------------------------------------------------------------- #


def apply_7pt(p, split, ctx: SpmdCtx, diag=None):
    """Â(p) (or A(p) with diag) — per-shard fused kernel, ±1 halo. The
    face-lite wxl weight array additionally sends its first plane left
    (the neighbor's missing high-face plane; zero at the global end,
    the sealed wall's boundary-face weight)."""
    from openfoam_tpp_tpu.ops.pallas import halo7

    s = ctx.spec
    nw = len(split) + (0 if diag is None else 1)

    def f(p, wxl, wyl, wzl, *extra):
        lo, hi = exchange_halo(p, 1, ctx.axis)
        wx_hi = exchange_hi(wxl, 1, ctx.axis, edge="zero")
        d = extra[0] if diag is not None else None
        return halo7.apply_7pt_h(p, lo, hi, wx_hi, (wxl, wyl, wzl),
                                 diag=d, interpret=ctx.interpret)

    args = split if diag is None else (*split, diag)
    return ctx.smap(f, (s,) * (1 + nw), s)(p, *args)


def resid_scaled_7pt(p, split, ctx: SpmdCtx, b, diag=None):
    """(b − A·p)/diag (or b − Â·p) — per-shard fused kernel, ±1 halo."""
    from openfoam_tpp_tpu.ops.pallas import halo7

    s = ctx.spec
    nw = len(split) + (0 if diag is None else 1)

    def f(p, b, wxl, wyl, wzl, *extra):
        lo, hi = exchange_halo(p, 1, ctx.axis)
        wx_hi = exchange_hi(wxl, 1, ctx.axis, edge="zero")
        d = extra[0] if diag is not None else None
        return halo7.resid_scaled_7pt_h(p, lo, hi, wx_hi, (wxl, wyl, wzl),
                                        b, diag=d, interpret=ctx.interpret)

    args = split if diag is None else (*split, diag)
    return ctx.smap(f, (s,) * (2 + nw), s)(p, b, *args)


def apply_dot_7pt(p, split, ctx: SpmdCtx):
    """(Â·p, p·Â·p) — per-shard fused kernel + psum of the partials."""
    from openfoam_tpp_tpu.ops.pallas import halo7

    s = ctx.spec

    def f(p, wxl, wyl, wzl):
        lo, hi = exchange_halo(p, 1, ctx.axis)
        wx_hi = exchange_hi(wxl, 1, ctx.axis, edge="zero")
        ap, part = halo7.apply_dot_7pt_h(p, lo, hi, wx_hi,
                                         (wxl, wyl, wzl),
                                         interpret=ctx.interpret)
        return ap, psum_scalar(part, ctx.axis)

    return ctx.smap(f, (s,) * 4, (s, ctx.rep))(p, *split)


def flux_all(alpha, phis_cell, ucs_cell, ctx: SpmdCtx, anti_dtype=None):
    """All-axis MULES (low, anti) fluxes per shard — alpha's −2/−1/+1
    x-planes exchanged (clamp edges, the jnp edge-clamp semantics)."""
    from openfoam_tpp_tpu.ops.pallas import mules_flux as mfx

    s = ctx.spec

    def f(a, px, py, pz, ux, uy, uz):
        lo, hi = exchange_halo(a, 2, ctx.axis)
        lows, antis = mfx.flux_all_h(
            a, lo, hi[:1], (px, py, pz), (ux, uy, uz),
            anti_dtype=anti_dtype, interpret=ctx.interpret)
        return (*lows, *antis)

    out = ctx.smap(f, (s,) * 7, (s,) * 6)(alpha, *phis_cell, *ucs_cell)
    return (out[0], out[1], out[2]), (out[3], out[4], out[5])


def fct_iters(lams0, antis, alpha_low, amax, amin, dt_iv, spacing,
              n_iters: int, ctx: SpmdCtx, eps=1e-12):
    """All `n_iters` FCT limiter iterations in ONE shard_map island: the
    anti/cell halos are exchanged once (they are iteration-invariant),
    the λ halos once per iteration. x hi edges are zero (the implicit
    zero boundary face — the single-device kernel's `end` flag), lo
    edges clamp (harmless: zero antidiffusive boundary faces)."""
    from openfoam_tpp_tpu.ops.pallas import mules_fct as mf

    s = ctx.spec

    def f(lx, ly, lz, ax_, ay_, az_, al, amx, amn, div):
        ah = [exchange_halo(a, 1, ctx.axis, hi_edge="zero")
              for a in (ax_, ay_, az_)]
        anti_halos = ((ah[0][0], ah[0][1]), (ah[1][0], None),
                      (ah[2][0], None))
        cell_los = [exchange_halo(c, 1, ctx.axis)[0]
                    for c in (al, amx, amn, div)]
        lams = (lx, ly, lz)
        for _ in range(n_iters):
            lh = [exchange_halo(l, 1, ctx.axis, hi_edge="zero")
                  for l in lams]
            lam_halos = ((lh[0][0], lh[0][1]), (lh[1][0], None),
                         (lh[2][0], None))
            lams = mf.fct_iter_h(lams, lam_halos, (ax_, ay_, az_),
                                 anti_halos, cell_los, al, amx, amn,
                                 div, spacing, eps=eps,
                                 interpret=ctx.interpret)
        return lams

    return ctx.smap(f, (s,) * 10, (s,) * 3)(
        *lams0, *antis, alpha_low, amax, amin, dt_iv)


def momentum_rhs(u, v, w, rho_phi, mu, div_u, spacing, ctx: SpmdCtx,
                 dev2=True):
    """Full momentum RHS per shard (ops/pallas/momentum_rhs_h): u/v/w
    exchanged at width 2 (the MUSCL reach), rpx/μ at ±1, rpy/rpz/∇·U at
    −1. Same signature/returns as the single-device kernel (full face
    arrays in, au's zero wall plane re-appended)."""
    from openfoam_tpp_tpu.ops.pallas import momentum_rhs as mrk

    s = ctx.spec
    rpx, rpy, rpz = rho_phi
    if div_u is None:
        div_u = jnp.zeros_like(mu)

    def f(u_p, v, w, rpx_p, rpy, rpz, mu, du):
        ulo, uhi = exchange_halo(u_p, 2, ctx.axis, hi_edge="zero")
        vlo, vhi = exchange_halo(v, 2, ctx.axis)
        wlo, whi = exchange_halo(w, 2, ctx.axis)
        rxlo, rxhi = exchange_halo(rpx_p, 1, ctx.axis, hi_edge="zero")
        rylo, _ = exchange_halo(rpy, 1, ctx.axis)
        rzlo, _ = exchange_halo(rpz, 1, ctx.axis)
        mulo, muhi = exchange_halo(mu, 1, ctx.axis)
        dulo, _ = exchange_halo(du, 1, ctx.axis, lo_edge="zero")
        halos = (ulo, uhi, vlo, vhi, wlo, whi, rxlo, rxhi, rylo, rzlo,
                 mulo, muhi, dulo)
        return mrk.momentum_rhs_h(u_p, v, w, rpx_p, rpy, rpz, mu, du,
                                  halos, spacing, dev2=dev2,
                                  interpret=ctx.interpret)

    au_c, av, aw = ctx.smap(f, (s,) * 8, (s,) * 3)(
        u[:-1], v, w, rpx[:-1], rpy, rpz, mu, div_u)
    au = jnp.concatenate(
        [au_c, jnp.zeros((1,) + mu.shape[1:], mu.dtype)], 0)
    return au, av, aw


def correct_divmax(dp, u_s, v_s, w_s, beta_f, ax_ap, ay_ap, az_ap,
                   vfrac, top_open, rho_top, dt, spacing, ctx: SpmdCtx,
                   open_top=True):
    """Projection epilogue per shard: velocity correction + div max
    (ops/pallas/correction.correct_divmax_h), ±1 dp halo, +1 face halos
    for (u, βx, ax) — their global face-nx plane is the sealed wall, so
    the top edge fills zeros (the true values). Same signature/returns
    as the single-device kernel (full face arrays in, div max pmaxed)."""
    from openfoam_tpp_tpu.ops.pallas import correction as ck

    s, r = ctx.spec, ctx.rep
    bx, by, bz = beta_f

    def f(dp, u_p, v, w, bx_p, by, bz, ax_p, ay, az, vf, topo, rhot, dt):
        dlo, dhi = exchange_halo(dp, 1, ctx.axis)
        _, uhi = exchange_halo(u_p, 1, ctx.axis, hi_edge="zero")
        _, bhi = exchange_halo(bx_p, 1, ctx.axis, hi_edge="zero")
        _, ahi = exchange_halo(ax_p, 1, ctx.axis, hi_edge="zero")
        uc, vc, wc, dmax = ck.correct_divmax_h(
            dp, dlo, dhi, u_p, uhi, v, w, bx_p, bhi, by, bz,
            ax_p, ahi, ay, az, vf, topo, rhot, dt, spacing,
            open_top=open_top, interpret=ctx.interpret)
        return uc, vc, wc, pmax_scalar(dmax, ctx.axis)

    uc, vc, wc, dmax = ctx.smap(
        f, (s,) * 13 + (r,), (s, s, s, r))(
        dp, u_s[:-1], v_s, w_s, bx[:-1], by, bz,
        ax_ap[:-1], ay_ap, az_ap, vfrac, top_open, rho_top,
        jnp.asarray(dt, dp.dtype))
    u_full = jnp.concatenate(
        [uc, jnp.zeros((1,) + dp.shape[1:], dp.dtype)], 0)
    return u_full, vc, wc, dmax
