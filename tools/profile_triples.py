"""Ablation profile of the spin-orbital triples stage on the real TPU.

Times the production `_triples_total` (precision="pallas") against
structurally identical variants with pieces removed, so the wall
decomposes into measured components instead of guesses:

  full        production: 6 GEMMs + t3d outers + Pallas finale
  gemm-only   same fori_loop, finale replaced by a plain f32 sum of the
              panels (keeps every GEMM + the HBM panel writes)
  fsum-only   only the three f-sum GEMMs (K=v) kept
  msum-only   only the three m-sum GEMMs (K=o) kept
  finale-only the Pallas finale looped over prebuilt resident panels

Usage:  python tools/profile_triples.py   (expects the pVTZ fixture)
"""

from __future__ import annotations

import time
from functools import partial
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def force_scalar(x):
    return float(np.asarray(x))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from afesp_tpu.config import read_els_in
    from afesp_tpu.io import dat
    from afesp_tpu.methods import hf as hf_mod
    from afesp_tpu.methods import mp2 as mp2_mod
    from afesp_tpu.methods.ccsd_spinorb import do_ccsd_spinorb
    from afesp_tpu.methods import triples_spinorb as T
    from afesp_tpu import flops

    import shutil
    import tempfile

    fixture = Path("/root/reference/sample_data/h2o-cc-pvtz/2.00_104.45")
    eri = REPO / "data" / "h2o-cc-pvtz" / "eri.dat"
    workdir = Path(tempfile.mkdtemp())
    for f in ("s.dat", "t.dat", "v.dat", "geom.dat", "els.in"):
        shutil.copy(fixture / f, workdir / f)
    shutil.copy(eri, workdir / "eri.dat")
    cfg = read_els_in(workdir)
    cfg.calc_type = "CCSD(T)_spinorb"
    sys_, ints = dat.read_integrals(workdir, cfg.restricted)
    hf = hf_mod.do_rhf(sys_, ints, cfg, workdir=workdir)
    mp2 = mp2_mod.do_mp2_spatial(sys_, ints, cfg, hf, workdir=workdir)
    cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, workdir=workdir)

    nocc, nvirt = sys_.nocc, sys_.nvirt
    from afesp_tpu.ops.spin import spinorb_levels

    lv = spinorb_levels(jnp.asarray(hf.levels), nocc // 2)
    e_o, e_v = lv[:nocc], lv[nocc:]
    t1, t2 = jnp.asarray(cc.t1), jnp.asarray(cc.t2)
    v = cc.slices
    args = (t1, t2, v.vovv, v.ovoo, v.oovv, e_o, e_v)
    jlen = T._pick_jlen(nocc, nvirt, "pallas")
    print(f"o={nocc} v={nvirt} jlen={jlen}")

    es = partial(jnp.einsum, optimize=True)

    def islice_panels(i0, j0, t1, t2, vovv, ovoo, oovv, *, jlen, which):
        dj = lambda x, ax: jax.lax.dynamic_slice_in_dim(x, j0, jlen, axis=ax)
        t2_i = jnp.take(t2, i0, axis=0)
        t2_ci = jnp.take(t2, i0, axis=1)
        t1_i = jnp.take(t1, i0, axis=0)
        vovv_i = jnp.take(vovv, i0, axis=1)
        ovoo_i3 = jnp.take(ovoo, i0, axis=2)
        ovoo_i4 = jnp.take(ovoo, i0, axis=3)
        oovv_i = jnp.take(oovv, i0, axis=0)
        oovv_ci = jnp.take(oovv, i0, axis=1)
        t3c = 0.0
        if which in ("all", "fsum"):
            t3c = (
                es("jkaf,fbc->jkabc", dj(t2, 0), vovv_i)
                - es("kaf,fjbc->jkabc", t2_i, dj(vovv, 1))
                - es("jaf,fkbc->jkabc", dj(t2_ci, 0), vovv)
            )
        if which in ("all", "msum"):
            t3c = t3c - (
                es("mcb,majk->jkabc", t2_ci, dj(ovoo, 2))
                - es("mjcb,mak->jkabc", dj(t2, 1), ovoo_i3)
                - es("mkcb,maj->jkabc", t2, dj(ovoo_i4, 2))
            )
        t3d = (
            es("a,jkbc->jkabc", t1_i, dj(oovv, 0))
            - es("ja,kbc->jkabc", dj(t1, 0), oovv_i)
            - es("ka,jbc->jkabc", t1, dj(oovv_ci, 0))
        )
        return t3c, t3d

    def total_variant(which, with_t3d):
        @partial(jax.jit, static_argnames=())
        def run(t1, t2, vovv, ovoo, oovv, e_o, e_v):
            f32 = jnp.float32
            t1_, t2_, vovv_, ovoo_, oovv_ = (
                x.astype(f32) for x in (t1, t2, vovv, ovoo, oovv)
            )
            nslab = nocc // jlen

            def body(idx, acc):
                i0 = idx // nslab
                j0 = (idx % nslab) * jlen
                t3c, t3d = islice_panels(
                    i0, j0, t1_, t2_, vovv_, ovoo_, oovv_, jlen=jlen, which=which
                )
                s = jnp.sum(t3c, dtype=jnp.float32)
                if with_t3d:
                    s = s + jnp.sum(t3d, dtype=jnp.float32)
                return acc + s.astype(jnp.float64)

            return jax.lax.fori_loop(0, nocc * nslab, body, jnp.float64(0.0))

        return run

    def timeit(label, fn, *a, n=5):
        r = fn(*a)
        force_scalar(r)  # compile+first run
        t0 = time.perf_counter()
        for _ in range(n):
            r = fn(*a)
        out = force_scalar(r)
        dt = (time.perf_counter() - t0) / n
        print(f"{label:14s} {dt*1e3:9.1f} ms   (value {out:.6e})")
        return dt

    # production strict-triangle path (all precisions)
    si, sj, sk, clen = T.strict_plan(nocc, nvirt, "pallas")
    sidx = (jnp.asarray(si), jnp.asarray(sj), jnp.asarray(sk))
    print(f"strict triples: {len(si)} (clen={clen})")
    strict = timeit(
        "strict-pallas",
        partial(T._triples_total_strict, clen=clen, precision="pallas"),
        *args, *sidx,
    )
    strict_h = timeit(
        "strict-hybrid",
        partial(T._triples_total_strict, clen=clen, precision="hybrid"),
        *args, *sidx,
    )

    # legacy full-cube islice path
    full = timeit(
        "full",
        partial(T._triples_total, nocc=nocc, jlen=jlen, precision="pallas"),
        *args,
    )
    hyb = timeit(
        "full-hybrid",
        partial(T._triples_total, nocc=nocc, jlen=jlen, precision="hybrid"),
        *args,
    )
    gemm = timeit("gemm-only", total_variant("all", True), *args)
    fsum = timeit("fsum-only", total_variant("fsum", False), *args)
    msum = timeit("msum-only", total_variant("msum", False), *args)

    # finale on resident panels: one slab's panels, looped nocc*nslab x
    from afesp_tpu.ops.triples_pallas import triples_finale

    nslab = nocc // jlen
    f32 = jnp.float32
    t1_, t2_, vovv_, ovoo_, oovv_ = (
        x.astype(f32) for x in (t1, t2, v.vovv, v.ovoo, v.oovv)
    )
    t3c, t3d = islice_panels(
        0, 0, t1_, t2_, vovv_, ovoo_, oovv_, jlen=jlen, which="all"
    )
    t3c = t3c.reshape(-1, nvirt, nvirt, nvirt)
    t3d = t3d.reshape(-1, nvirt, nvirt, nvirt)
    eo_sum = (
        (e_o[0] + jax.lax.dynamic_slice_in_dim(e_o, 0, jlen)[:, None] + e_o[None, :])
        .reshape(-1)
        .astype(jnp.float32)
    )
    evf = e_v.astype(jnp.float32)

    @jax.jit
    def finale_loop(t3c, t3d, eo_sum, evf):
        def body(_, acc):
            return acc + triples_finale(t3c, t3d, eo_sum, evf)

        return jax.lax.fori_loop(0, nocc * nslab, body, jnp.float64(0.0))

    fin = timeit("finale-only", finale_loop, t3c, t3d, eo_sum, evf)

    fl = flops.spinorb_triples_flops(nocc, nvirt)
    flx = flops.spinorb_triples_flops(nocc, nvirt, strict=True)
    print(f"\nalgorithmic triples FLOPs: {fl:.3e}  executed (strict): {flx:.3e}")
    print(
        f"strict: {fl/strict/1e12:.1f} TF/s effective; "
        f"{flx/strict/1e12:.1f} TF/s executed "
        f"({flx/strict/103e12*100:.1f}% of f32 ceiling)"
    )
    print(f"full: {fl/full/1e12:.1f} TF/s ({fl/full/103e12*100:.1f}% of f32 ceiling)")
    print(
        f"decomposition: gemm {gemm*1e3:.0f} (fsum {fsum*1e3:.0f} + msum {msum*1e3:.0f})"
        f" + finale/panel-io {max(full-gemm,0)*1e3:.0f}; finale-resident {fin*1e3:.0f}"
    )


if __name__ == "__main__":
    main()
