"""Spin-orbital CCSD(T) — the headline compute kernel.

Re-implements do_ccsd_t_spinorb (ccsd.f90:1812-1922) / the OpenACC GPU
variant (1924-2016): batched triples over (i,j,k) with nvirt^3 panels,
never materialising the 6-D t3 tensor.

  t3d(abc)*D = P(i/jk)P(a/bc) t1[i,a] <jk||bc>
  t3c(abc)*D = P(i/jk)P(a/bc) [ f-sum - m-sum ]   (ccsd.f90:1878-1907)
  E(T) = sum_{ijk,abc} t3c * (t3c/D + t3d/D) / 36

Production grid: the STRICT triangle i<j<k only (strict_triple_list —
the summand is S3-symmetric and vanishes on diagonals, so 6x weight on
C(o,3) triples replaces the reference's o^3 cube at 8.3x less work),
evaluated either as chunked batched XLA GEMMs + the Pallas finale
(precision="pallas"/"hybrid"/"f64") or fully inside the fused Pallas
kernel (precision="fused", ops/triples_pallas.triples_fused).  The same
chunk kernel is what `parallel.triples_shard` distributes over a device
mesh (each device takes a slab of triples, psum for the energy).
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io import dat
from ..io.report import Reporter
from .ccsd_spinorb import CCSDSpinorbResult


def _chunk_panels(ii, jj, kk, t1, t2, vovv, ovoo, oovv):
    """t3c/t3d numerator panels, (C, v, v, v), for a chunk of (i,j,k)
    triples given as (C,) index arrays — batched MXU GEMMs over gathered
    operands.  Panels carry the P(i/jk) row permutation only; P(a/bc),
    the denominator and the reduction are the finale's job."""
    es = partial(jnp.einsum, optimize=True)

    # Disconnected triples numerator: P(i/jk) rows (ccsd.f90:1878),
    # later antisymmetrised over P(a/bc) by the finale.
    # base[C,a,b,c] = t1[i,a] <jk||bc> - t1[j,a] <ik||bc> - t1[k,a] <ji||bc>
    t3d = (
        es("Ca,Cbc->Cabc", t1[ii], oovv[jj, kk])
        - es("Ca,Cbc->Cabc", t1[jj], oovv[ii, kk])
        - es("Ca,Cbc->Cabc", t1[kk], oovv[jj, ii])
    )

    # Connected triples numerator (ccsd.f90:1883-1890):
    # base[C,a,b,c] = sum_f [ vovv[f,i,b,c] t2[j,k,a,f] - vovv[f,j,b,c] t2[i,k,a,f]
    #                         - vovv[f,k,b,c] t2[j,i,a,f] ]
    #              - sum_m [ t2[m,i,c,b] ovoo[m,a,j,k] - t2[m,j,c,b] ovoo[m,a,i,k]
    #                         - t2[m,k,c,b] ovoo[m,a,j,i] ]
    t3c = (
        es("Caf,fCbc->Cabc", t2[jj, kk], vovv[:, ii])
        - es("Caf,fCbc->Cabc", t2[ii, kk], vovv[:, jj])
        - es("Caf,fCbc->Cabc", t2[jj, ii], vovv[:, kk])
        - es("mCcb,maC->Cabc", t2[:, ii], ovoo[:, :, jj, kk])
        + es("mCcb,maC->Cabc", t2[:, jj], ovoo[:, :, ii, kk])
        + es("mCcb,maC->Cabc", t2[:, kk], ovoo[:, :, jj, ii])
    )
    return t3c, t3d


def triples_chunk_energies(ii, jj, kk, t1, t2, vovv, ovoo, oovv, e_o, e_v):
    """Per-triple E(T) contributions for a chunk of (i,j,k) triples.

    ii/jj/kk: (C,) index arrays.  Returns a (C,) vector of contributions
    (including the 1/36 factor, ccsd.f90:1910); the caller reduces.
    """
    t3c, t3d = _chunk_panels(ii, jj, kk, t1, t2, vovv, ovoo, oovv)

    # P(a/bc): x - x(bac) - x(cba) (ccsd.f90:1897-1907)
    def p_abc(x):
        return x - jnp.transpose(x, (0, 2, 1, 3)) - jnp.transpose(x, (0, 3, 2, 1))

    t3d = p_abc(t3d)
    t3c = p_abc(t3c)

    D = (
        (e_o[ii] + e_o[jj] + e_o[kk])[:, None, None, None]
        - e_v[None, :, None, None]
        - e_v[None, None, :, None]
        - e_v[None, None, None, :]
    )
    return jnp.sum(t3c * (t3c / D + t3d / D), axis=(1, 2, 3)) / 36.0


@jax.jit
def _triples_chunk(ii, jj, kk, t1, t2, vovv, ovoo, oovv, e_o, e_v):
    return jnp.sum(
        triples_chunk_energies(ii, jj, kk, t1, t2, vovv, ovoo, oovv, e_o, e_v)
    )


def _islice_energy(
    i0, j0, t1, t2, vovv, ovoo, oovv, e_o, e_v, *, jlen: int, precision: str = "f64"
):
    """E(T) contribution of the (i=i0, j in [j0, j0+jlen), all k) slab.

    Static-slice formulation of the same math as triples_chunk_energies:
    every contraction is a dense GEMM over contiguous operands (no big
    gathers), which is how the MXU wants the reference's per-(i,j,k)
    panel loop (ccsd.f90:1868-1914) batched.

    precision:
      "f64"    — XLA-emulated f64 GEMMs everywhere (bit-for-bit safe)
      "hybrid" — the six O(v^3)-per-triple contractions and the P(a/bc)
        permutation algebra run in f32 on the MXU (inputs are exactly
        representable to ~6e-8 relative); the denominator D and the
        energy reduction stay f64.  Because t3c enters the energy
        quadratically and the ~1e9
        per-element rounding errors cancel statistically, the end-to-end
        E(T) shift is ~1e-10 Ha (validated against the f64 path in
        tests/test_triples_precision.py) — far inside the 1e-8 contract.
    """
    es = partial(jnp.einsum, optimize=True)
    dj = lambda x, ax: jax.lax.dynamic_slice_in_dim(x, j0, jlen, axis=ax)

    if precision in ("hybrid", "pallas"):
        # cast only the GEMM operands to f32; e_o/e_v (and hence the
        # denominator D and the energy reduction) stay f64 so small-gap
        # systems cannot lose the 1e-8 contract to an f32 denominator
        f32 = jnp.float32
        t1 = t1.astype(f32)
        t2 = t2.astype(f32)
        vovv = vovv.astype(f32)
        ovoo = ovoo.astype(f32)
        oovv = oovv.astype(f32)

    t2_i = jnp.take(t2, i0, axis=0)  # t2[i0,k,:,:]   (o,v,v)
    t2_ci = jnp.take(t2, i0, axis=1)  # t2[m/j,i0,:,:] (o,v,v)
    t1_i = jnp.take(t1, i0, axis=0)  # (v,)
    vovv_i = jnp.take(vovv, i0, axis=1)  # vovv[f,i0,b,c] (v,v,v)
    ovoo_i3 = jnp.take(ovoo, i0, axis=2)  # ovoo[m,a,i0,k] (o,v,o)
    ovoo_i4 = jnp.take(ovoo, i0, axis=3)  # ovoo[m,a,j,i0] (o,v,o)
    oovv_i = jnp.take(oovv, i0, axis=0)  # oovv[i0,k,b,c] (o,v,v)
    oovv_ci = jnp.take(oovv, i0, axis=1)  # oovv[j,i0,b,c] (o,v,v)

    # -- connected numerator, P(i/jk) rows (ccsd.f90:1883-1890) --
    # base[j,k,a,b,c] =   sum_f vovv[f,i0,b,c] t2[j,k,a,f]
    #                   - sum_f vovv[f,j,b,c]  t2[i0,k,a,f]
    #                   - sum_f vovv[f,k,b,c]  t2[j,i0,a,f]
    #                   - sum_m t2[m,i0,c,b] ovoo[m,a,j,k]
    #                   + sum_m t2[m,j,c,b]  ovoo[m,a,i0,k]
    #                   + sum_m t2[m,k,c,b]  ovoo[m,a,j,i0]
    t3c = (
        es("jkaf,fbc->jkabc", dj(t2, 0), vovv_i)
        - es("kaf,fjbc->jkabc", t2_i, dj(vovv, 1))
        - es("jaf,fkbc->jkabc", dj(t2_ci, 0), vovv)
        - es("mcb,majk->jkabc", t2_ci, dj(ovoo, 2))
        + es("mjcb,mak->jkabc", dj(t2, 1), ovoo_i3)
        + es("mkcb,maj->jkabc", t2, dj(ovoo_i4, 2))
    )

    # -- disconnected numerator (ccsd.f90:1878) --
    t3d = (
        es("a,jkbc->jkabc", t1_i, dj(oovv, 0))
        - es("ja,kbc->jkabc", dj(t1, 0), oovv_i)
        - es("ka,jbc->jkabc", t1, dj(oovv_ci, 0))
    )

    eo_sum = e_o[i0] + jax.lax.dynamic_slice_in_dim(e_o, j0, jlen)[:, None] + e_o[None, :]

    if precision == "pallas":
        # fused VMEM finale: P(a/bc) + denominator + product + reduction
        from ..ops.triples_pallas import triples_finale

        nv = t3c.shape[-1]
        return (
            triples_finale(
                t3c.reshape(-1, nv, nv, nv),
                t3d.reshape(-1, nv, nv, nv),
                eo_sum.reshape(-1).astype(jnp.float32),
                e_v.astype(jnp.float32),
            )
            / 36.0
        )

    def p_abc(x):
        return x - jnp.transpose(x, (0, 1, 3, 2, 4)) - jnp.transpose(x, (0, 1, 4, 3, 2))

    t3c = p_abc(t3c)
    t3d = p_abc(t3d)

    D = (
        eo_sum[:, :, None, None, None]
        - e_v[None, None, :, None, None]
        - e_v[None, None, None, :, None]
        - e_v[None, None, None, None, :]
    )
    # the reduction always accumulates in f64 (panel products are f32 in
    # hybrid mode; errors cancel statistically — see module tests)
    return jnp.sum(t3c * (t3c + t3d) / D, dtype=jnp.float64) / 36.0


_triples_islice = partial(jax.jit, static_argnames=("jlen", "precision"))(
    _islice_energy
)


@partial(jax.jit, static_argnames=("nocc", "jlen", "precision"))
def _triples_total(
    t1, t2, vovv, ovoo, oovv, e_o, e_v, *, nocc: int, jlen: int, precision: str
):
    """E(T) over the FULL (i, j-slab) grid as ONE compiled program
    (lax.fori_loop over the slabs) — under a remote-tunnel TPU the
    per-slab dispatch latency otherwise dominates the triples stage.
    jlen must divide nocc (the caller picks the largest divisor within
    the memory budget; nocc is even for any closed-shell system)."""
    assert nocc % jlen == 0
    nslab = nocc // jlen
    if precision in ("hybrid", "pallas"):
        # hoist the f64->f32 operand casts out of the slab loop: inside
        # _islice_energy they would re-run every fori_loop iteration
        # (XLA does not LICM the ~150 MB of convert ops out of the loop)
        f32 = jnp.float32
        t1, t2, vovv, ovoo, oovv = (
            x.astype(f32) for x in (t1, t2, vovv, ovoo, oovv)
        )
    args = (t1, t2, vovv, ovoo, oovv, e_o, e_v)

    def body(idx, acc):
        i0 = idx // nslab
        j0 = (idx % nslab) * jlen
        return acc + _islice_energy(i0, j0, *args, jlen=jlen, precision=precision)

    return jax.lax.fori_loop(0, nocc * nslab, body, jnp.float64(0.0))


def strict_triple_list(nocc: int):
    """All strictly-ordered occupied triples i<j<k, lexicographic, as
    int32 numpy arrays (C(nocc,3) entries).

    The full-cube sum the reference runs (ccsd.f90:1868-1914, all o^3
    (i,j,k)) is 6-fold redundant: the t3 numerators are fully
    antisymmetric in (i,j,k) (they are P(i/jk) applied to operands
    already antisymmetric in the remaining pair), the denominator D is
    symmetric, so the per-triple summand is (i,j,k)-symmetric and
    vanishes whenever two indices coincide.  Summing i<j<k and scaling
    by 6/36 = 1/6 is exact — and cuts the executed GEMM work ~8.3x at
    nocc=10 (120 strict triples vs the 1000-panel cube)."""
    idx = np.arange(nocc, dtype=np.int32)
    ii, jj, kk = np.meshgrid(idx, idx, idx, indexing="ij")
    m = (ii < jj) & (jj < kk)
    return ii[m], jj[m], kk[m]


def _pick_clen(nvirt: int, precision: str, total: int) -> int:
    """Largest per-chunk triple count whose ~12 live (C, v^3) transients
    fit a ~10 GB HBM budget.  f64 operands inside XLA dots decompose
    into f32 limb arrays ~4x the f64 bytes, hence the 32 B/element."""
    el = 4 if precision in ("hybrid", "pallas", "fused") else 32
    return max(1, min(total, int(10e9 / (12 * el * nvirt**3))))


def strict_plan(nocc: int, nvirt: int, precision: str, multiple: int = 1):
    """(ii, jj, kk, clen) for the strict-triangle grid: the triple list
    padded with (0,0,0) entries — which contribute exactly zero, since
    every numerator term then carries a vanishing t2[p,p] / <pp||bc> /
    <ma||pp> factor — to a multiple of clen*multiple."""
    ii, jj, kk = strict_triple_list(nocc)
    total = len(ii)
    if total == 0:
        return ii, jj, kk, 1
    clen = _pick_clen(nvirt, precision, total)
    npad = -(-total // (clen * multiple)) * (clen * multiple) - total
    pad = np.zeros(npad, dtype=np.int32)
    return (
        np.concatenate([ii, pad]),
        np.concatenate([jj, pad]),
        np.concatenate([kk, pad]),
        clen,
    )


def _strict_chunk_energy(
    iii, jjj, kkk, t1, t2, vovv, ovoo, oovv, e_o, e_v, precision: str
):
    """Sum of E(T)*6 contributions of one chunk of strict triples (the
    global 1/6 is applied by the caller).  Operands arrive already cast
    (f32 for hybrid/pallas); e_o/e_v stay f64 except inside the Pallas
    finale, whose all-f32 denominator is validated in
    tests/test_triples_pallas.py."""
    t3c, t3d = _chunk_panels(iii, jjj, kkk, t1, t2, vovv, ovoo, oovv)
    eo_sum = e_o[iii] + e_o[jjj] + e_o[kkk]
    if precision == "pallas":
        from ..ops.triples_pallas import triples_finale

        return triples_finale(
            t3c, t3d, eo_sum.astype(jnp.float32), e_v.astype(jnp.float32)
        )

    def p_abc(x):
        return x - jnp.transpose(x, (0, 2, 1, 3)) - jnp.transpose(x, (0, 3, 2, 1))

    t3c = p_abc(t3c)
    t3d = p_abc(t3d)
    D = (
        eo_sum[:, None, None, None]
        - e_v[None, :, None, None]
        - e_v[None, None, :, None]
        - e_v[None, None, None, :]
    )
    # D (and hence the product and reduction) is f64 in every mode
    return jnp.sum(t3c * (t3c + t3d) / D, dtype=jnp.float64)


@partial(jax.jit, static_argnames=("clen", "precision"))
def _triples_total_strict(
    t1, t2, vovv, ovoo, oovv, e_o, e_v, ii, jj, kk, *, clen: int, precision: str
):
    """E(T) over the strict i<j<k triple list as ONE compiled program
    (lax.fori_loop over chunks of clen triples).  ii/jj/kk are padded to
    a multiple of clen (strict_plan)."""
    if precision == "fused":
        # fully-fused Pallas kernel: GEMMs + finale VMEM-resident per
        # triple, no chunking (nothing O(v^3) ever reaches HBM)
        from ..ops.triples_pallas import triples_fused

        return triples_fused(t1, t2, vovv, ovoo, oovv, e_o, e_v, ii, jj, kk) / 6.0

    nchunk = ii.shape[0] // clen
    iic = ii.reshape(nchunk, clen)
    jjc = jj.reshape(nchunk, clen)
    kkc = kk.reshape(nchunk, clen)
    if precision in ("hybrid", "pallas"):
        # hoist the f64->f32 operand casts out of the chunk loop
        f32 = jnp.float32
        t1, t2, vovv, ovoo, oovv = (
            x.astype(f32) for x in (t1, t2, vovv, ovoo, oovv)
        )

    def body(c, acc):
        e = _strict_chunk_energy(
            iic[c], jjc[c], kkc[c],
            t1, t2, vovv, ovoo, oovv, e_o, e_v, precision,
        )
        return acc + e

    return jax.lax.fori_loop(0, nchunk, body, jnp.float64(0.0)) / 6.0


def _pick_jlen(nocc: int, nvirt: int, precision: str) -> int:
    """Largest divisor of nocc whose ~26 live (jlen*o*v^3) transients fit
    in a ~10 GB HBM budget (nocc is even for closed-shell systems, so
    divisors are never degenerate in practice)."""
    el = 4 if precision in ("hybrid", "pallas") else 8
    budget = max(1, min(nocc, int(10e9 / (26 * el * nocc * nvirt**3) + 1)))
    return max(d for d in range(1, budget + 1) if nocc % d == 0)


_PLAN_CACHE: dict = {}


# (o, v, precision) signatures whose Pallas compile failed (VMEM) —
# XLA does not cache failures, so repeat calls would re-pay the doomed
# server compile attempt (see triples_spatial._FUSED_BROKEN)
_PALLAS_BROKEN: set = set()


def _strict_plan_device(nocc: int, nvirt: int, precision: str):
    """strict_plan with the padded index triple memoized as DEVICE
    arrays: the plan is a pure function of (nocc, nvirt, precision), and
    re-uploading three index vectors per call costs three host->device
    round trips through the tunnel.  Returns (None, None, None, 1) when
    the triple list is empty."""
    key = (nocc, nvirt, precision)
    if key not in _PLAN_CACHE:
        ii, jj, kk, clen = strict_plan(nocc, nvirt, precision)
        if len(ii) == 0:
            _PLAN_CACHE[key] = (None, None, None, 1)
        else:
            _PLAN_CACHE[key] = (
                jnp.asarray(ii), jnp.asarray(jj), jnp.asarray(kk), clen
            )
    return _PLAN_CACHE[key]


def do_ccsd_t_spinorb(
    sys_: dat.System,
    cc: CCSDSpinorbResult,
    cfg: Config,
    levels: np.ndarray,
    rep: Reporter | None = None,
    precision: str | None = None,
    mesh=None,
) -> float:
    """Returns e_ccsd_t = e_ccsd + E(T) (ccsd.f90:1917).

    precision: "f64" | "hybrid" | "pallas" | "fused".  Default on TPU:
    "fused" — the fully VMEM-resident sorted-triples kernel
    (hardware-validated on the pVTZ headline: 52.5 ms vs 79.8 ms for
    the "pallas" chunk path at identical 1e-8 accuracy, BENCH r2) —
    when nvirt <= 128; "hybrid" (strict-triangle chunks + jnp finale)
    above that: the Pallas finale's v^3 VMEM window pads its minor dim
    past 128 lanes (140 -> 256, 1.83x) and blows the 128 MB budget
    (measured 165.8 MB reserved at nvirt=140, r4) — so the chunked
    hybrid path IS the production nvirt > 128 tier, the one
    tools/validate_spinorb_fallback.py validates on hardware.
    "hybrid" off-TPU too, where the Pallas kernels only exist in
    interpret mode."""
    if precision is None:
        import jax

        on_tpu = jax.default_backend() in ("tpu", "axon")
        if on_tpu:
            precision = "fused" if sys_.nvirt <= 128 else "hybrid"
        else:
            precision = "hybrid"
    rep = rep or Reporter()
    rep.section("CCSD(T)")
    t_start = time.perf_counter()

    nocc, nvirt = sys_.nocc, sys_.nvirt
    from ..ops.spin import spinorb_levels

    lv = spinorb_levels(jnp.asarray(levels), nocc // 2)
    e_o, e_v = lv[:nocc], lv[nocc:]

    t1 = jnp.asarray(cc.t1)
    t2 = jnp.asarray(cc.t2)
    v = cc.slices
    # <fi||bc> slice: vovv; <ma||jk>: ovoo; <jk||bc>: oovv (ccsd.f90:1834-1835)
    vovv, ovoo, oovv = v.vovv, v.ovoo, v.oovv

    args = (t1, t2, vovv, ovoo, oovv, e_o, e_v)
    if mesh is not None:
        # multi-chip: the SAME strict-triangle chunk kernel, shard_map'd
        # over the mesh with psum (parallel/triples_shard.py)
        from ..parallel.triples_shard import triples_total_sharded

        total = triples_total_sharded(
            mesh, *args, nocc=nocc, precision=precision
        )
    else:
        from .. import pallas_memo

        if precision in ("fused", "pallas") and (
            (nocc, nvirt, precision) in _PALLAS_BROKEN
            or pallas_memo.contains("spinorb", (nocc, nvirt, precision))
        ):
            precision = "hybrid"
        ii, jj, kk, clen = _strict_plan_device(nocc, nvirt, precision)
        if ii is None:
            total = 0.0
        else:
            try:
                total = float(
                    _triples_total_strict(
                        *args, ii, jj, kk, clen=clen, precision=precision,
                    )
                )
            except Exception as e:
                if precision not in ("fused", "pallas") or (
                    not pallas_memo.is_vmem_error(e)
                ):
                    raise  # only a VMEM failure may degrade the tier
                # Pallas VMEM margins are toolchain-dependent (see
                # triples_spatial's fallback note) — degrade to the jnp
                # finale instead of dying; memoise (in-process AND next
                # to the compile cache) so repeat calls and LATER
                # PROCESSES skip the ~minutes-long doomed attempt
                _PALLAS_BROKEN.add((nocc, nvirt, precision))
                pallas_memo.add("spinorb", (nocc, nvirt, precision))
                rep.write(
                    " Pallas triples kernel exceeded the VMEM budget"
                    f" ({pallas_memo.brief(e)});"
                    " falling back to the hybrid chunk path."
                )
                precision = "hybrid"
                ii, jj, kk, clen = _strict_plan_device(nocc, nvirt, precision)
                total = float(
                    _triples_total_strict(
                        *args, ii, jj, kk, clen=clen, precision=precision,
                    )
                )

    e_ccsd_t = total + cc.e_ccsd
    rep.write(
        f" Unrestricted CCSD(T) correlation energy (Hartree): {e_ccsd_t:15.9f}"
    )
    rep.stage_time(
        "Time taken for unrestricted CCSD(T):", time.perf_counter() - t_start
    )
    return e_ccsd_t
