"""Spin-orbital CCSD(T) — the headline compute kernel.

Re-implements do_ccsd_t_spinorb (ccsd.f90:1812-1922) / the OpenACC GPU
variant (1924-2016): batched triples over (i,j,k) with nvirt^3 panels,
never materialising the 6-D t3 tensor.

  t3d(abc)*D = P(i/jk)P(a/bc) t1[i,a] <jk||bc>
  t3c(abc)*D = P(i/jk)P(a/bc) [ sum_f t2[jk,af] <fi||bc> - sum_m t2[im,bc]? ... ]
  (exact contractions transcribed below from ccsd.f90:1878-1907)
  E(T) = sum_{ijk,abc} t3c * (t3c/D + t3d/D) / 36

The (i,j,k) triple space is processed in chunks of `chunk` triples; each
chunk is one jitted XLA program whose f-sum is a (chunk*v, v) x (v, v*v)
MXU matmul.  The same chunked structure is what `parallel.triples_shard`
distributes over a device mesh (each device takes a slab of chunks,
psum for the energy).
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


@partial(jax.jit, static_argnames=())
def _triples_chunk(ii, jj, kk, t1, t2, vovv, ovoo, oovv, e_o, e_v):
    """Energy contribution of a chunk of (i,j,k) triples.

    ii/jj/kk: (C,) index arrays.  Returns the summed E(T) contribution
    (including the 1/36 factor, ccsd.f90:1910).
    """
    es = partial(jnp.einsum, optimize=True)

    # Disconnected triples numerator: P(i/jk) rows (ccsd.f90:1878),
    # later antisymmetrised over P(a/bc) by the two transposes below.
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
    return jnp.sum(t3c * (t3c / D + t3d / D)) / 36.0


def do_ccsd_t_spinorb(
    sys_: dat.System,
    cc: CCSDSpinorbResult,
    cfg: Config,
    levels: np.ndarray,
    rep: Reporter | None = None,
    chunk: int = 0,
) -> float:
    """Returns e_ccsd_t = e_ccsd + E(T) (ccsd.f90:1917)."""
    rep = rep or Reporter()
    rep.section("CCSD(T)")
    t_start = time.perf_counter()

    nocc, nvirt = sys_.nocc, sys_.nvirt
    from ..ops.spin import spinorb_levels

    lv = spinorb_levels(jnp.asarray(levels))
    e_o, e_v = lv[:nocc], lv[nocc:]

    t1 = jnp.asarray(cc.t1)
    t2 = jnp.asarray(cc.t2)
    v = cc.slices
    # <fi||bc> slice: vovv; <ma||jk>: ovoo; <jk||bc>: oovv (ccsd.f90:1834-1835)
    vovv, ovoo, oovv = v.vovv, v.ovoo, v.oovv

    if chunk <= 0:
        # bound per-chunk transients (~3 tensors of C*v^3 f64) to ~1 GB
        chunk = max(1, min(nocc**3, int(1e9 / (3 * 8 * nvirt**3) + 1)))

    idx = np.arange(nocc)
    ii, jj, kk = (x.ravel() for x in np.meshgrid(idx, idx, idx, indexing="ij"))
    total = 0.0
    # at most two distinct chunk shapes compile (body + tail)
    for s in range(0, len(ii), chunk):
        sl = slice(s, min(s + chunk, len(ii)))
        total += float(
            _triples_chunk(
                jnp.asarray(ii[sl]),
                jnp.asarray(jj[sl]),
                jnp.asarray(kk[sl]),
                t1,
                t2,
                vovv,
                ovoo,
                oovv,
                e_o,
                e_v,
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
