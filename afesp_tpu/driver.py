"""Pipeline driver — the program `main` equivalent (main.F90:24-186).

Dispatch on (restricted, calc_type):
  restricted:   RHF -> MP2_spatial -> CCSD_spatial -> (T)_spatial family
  spin-orbital: RHF -> MP2_spatial -> CCSD_spinorb -> (T)_spinorb
with the reference's timing lines and final energy-breakdown table
(labels are scraped by the binding-curve wrapper, so they are API).
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path

from .config import CalcType, Config, read_els_in
from .io import dat
from .io.report import Reporter
from .methods import hf as hf_mod
from .methods import mp2 as mp2_mod
from .methods.ccsd_spatial import do_ccsd_spatial
from .methods.ccsd_spinorb import do_ccsd_spinorb
from .methods.triples_spatial import TriplesResult, do_ccsd_t_spatial
from .methods.triples_spinorb import do_ccsd_t_spinorb


@dataclasses.dataclass
class RunResult:
    cfg: Config
    sys: dat.System
    e_nuc: float
    e_hf: float = 0.0  # electronic
    e_mp2: float = 0.0
    e_ccsd: float = 0.0
    e_ccsd_t: float = 0.0  # spinorb CCSD(T) (or spatial CCSD[T])
    triples: TriplesResult | None = None
    t1_diagnostic: float = 0.0
    e_highest: float = 0.0

    @property
    def total_energy(self) -> float:
        return self.e_hf + self.e_highest + self.e_nuc


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache (repeat runs skip the ~minute-scale
    f64-program compiles).  Directory override: AFESP_JAX_CACHE; set it
    empty to disable."""
    cache = os.environ.get("AFESP_JAX_CACHE", str(Path(__file__).resolve().parent.parent / ".jax_cache"))
    if not cache:
        return
    try:
        import jax

        Path(cache).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        # warn (once, loudly) when the shipped cache was built for a
        # different jaxlib/topology — a silent mismatch recompiles for
        # minutes while the README promises seconds
        from . import cachemeta

        cachemeta.check(cache)
    except Exception:
        pass  # best effort — an unwritable cache dir must not kill the run


def run_calculation(
    workdir: str | Path = ".", rep: Reporter | None = None, cfg: Config | None = None
) -> RunResult:
    rep = rep or Reporter()
    workdir = Path(workdir)
    t_glob = time.perf_counter()
    _enable_compile_cache()

    # optional jax.profiler trace (the TPU analog of the reference's
    # system_clock instrumentation, SURVEY.md section 5)
    profile_dir = os.environ.get("AFESP_JAX_PROFILE")
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)

    rep.banner()
    t0 = time.perf_counter()
    if cfg is None:
        cfg = read_els_in(workdir)

    rep.section("Integral read-in")
    rep.write(" Getting number of basis functions...")
    rep.write(" Allocating integral store...")
    rep.write(" Reading overlap matrix...")
    rep.write(" Reading kinetic integrals...")
    rep.write(" Reading nuclear-electron integrals...")
    rep.write(" Constructing core Hamiltonian...")
    rep.write(" Reading two-body integrals...")
    sys_, ints = dat.read_integrals(workdir, cfg.restricted)
    rep.write(" Done reading integrals!")
    # compile-ahead: start prefetching the CC executables while the
    # host-bound SCF/MP2 stages run
    from . import warmup

    warmup.start(sys_, cfg)
    rep.sys_info(sys_, ints, cfg)
    rep.stage_time(
        "Time taken for system initialisation:", time.perf_counter() - t0
    )

    res = RunResult(cfg=cfg, sys=sys_, e_nuc=ints.e_nuc)

    # optional device mesh for the multi-chip CC/triples paths (els.in
    # knob `mesh_devices`; the reference has no distributed backend —
    # MPI is an unticked TODO, README.md:35)
    mesh = None
    if cfg.mesh_devices and cfg.mesh_devices != 1:
        import jax

        from .parallel.mesh import default_mesh

        ndev = len(jax.devices())
        want = ndev if cfg.mesh_devices < 0 else cfg.mesh_devices
        if want > ndev:
            raise ValueError(
                f"mesh_devices={cfg.mesh_devices} but only {ndev} devices visible"
            )
        if want >= 2:
            mesh = default_mesh(want)
            rep.write(f" Using a {want}-device mesh for CC stages.")

    hf = hf_mod.do_rhf(sys_, ints, cfg, rep, workdir)
    res.e_hf = hf.e_hf
    res.e_highest = 0.0

    calcname = "CCSD"
    if cfg.wants_mp2:
        mp2 = mp2_mod.do_mp2_spatial(sys_, ints, cfg, hf, rep, workdir)
        res.e_mp2 = mp2.e_mp2
        res.e_highest = mp2.e_mp2

        if cfg.wants_ccsd:
            if cfg.restricted:
                t_cc = time.perf_counter()
                cc = do_ccsd_spatial(
                    sys_, mp2.eri_mo, cfg, hf, rep, workdir, mesh=mesh,
                    slices=mp2.slices, vvvv_B=mp2.vvvv_B,
                )
                rep.stage_time(
                    "Time taken for restricted CCSD:", time.perf_counter() - t_cc
                )
                res.e_ccsd = cc.e_ccsd
                res.t1_diagnostic = cc.t1_diagnostic
                res.e_highest = cc.e_ccsd
                if cfg.wants_triples:
                    tr = do_ccsd_t_spatial(sys_, cc, cfg, hf.levels, rep, mesh=mesh)
                    res.triples = tr
                    res.e_highest = tr.e_highest - 0.0
                    calcname = tr.calcname
            else:
                if mp2.eri_mo is None:
                    raise ValueError(
                        "spin-orbital CCSD needs the dense MO tensor; the"
                        f" streaming tier (nbasis >= {mp2_mod.STREAM_NBASIS})"
                        " currently serves the spatial formulation only —"
                        " use a *_spatial calc_type at this scale"
                    )
                t_cc = time.perf_counter()
                cc = do_ccsd_spinorb(sys_, mp2.eri_mo, cfg, hf, rep, workdir, mesh=mesh)
                rep.stage_time(
                    "Time taken for unrestricted CCSD:", time.perf_counter() - t_cc
                )
                res.e_ccsd = cc.e_ccsd
                res.e_highest = cc.e_ccsd
                if cfg.wants_triples:
                    e_t = do_ccsd_t_spinorb(sys_, cc, cfg, hf.levels, rep, mesh=mesh)
                    res.e_ccsd_t = e_t
                    res.e_highest = e_t

    _final_breakdown(rep, res, calcname)
    rep.finish(time.perf_counter() - t_glob)
    if profile_dir:
        import jax

        jax.profiler.stop_trace()
    return res


def _final_breakdown(rep: Reporter, res: RunResult, calcname: str) -> None:
    """The breakdown table (main.F90:123-175); labels are scraped by
    els_wrapper.py:104-127 and must not change."""
    cfg = res.cfg
    e0 = res.e_hf + res.e_nuc
    rep.write(" " + "=" * 64)
    rep.write(" Final energy breakdown")
    rep.breakdown_line("RHF energy:", e0)
    ct = cfg.calc_type
    if ct in (CalcType.MP2, CalcType.CCSD, CalcType.CCSD_T):
        rep.breakdown_line("MP2 correlation energy:", res.e_mp2)
        rep.breakdown_line("MP2 energy:", res.e_mp2 + e0)
        if ct in (CalcType.CCSD, CalcType.CCSD_T):
            rep.breakdown_line("CCSD correlation energy:", res.e_ccsd)
            rep.breakdown_line("CCSD energy:", res.e_ccsd + e0)
            if ct is CalcType.CCSD_T and cfg.restricted:
                tr = res.triples
                rep.breakdown_line("CCSD[T] correlation energy:", tr.e_ccsd_t)
                rep.breakdown_line("CCSD[T] energy:", tr.e_ccsd_t + e0)
                if cfg.ccsd_t_paren:
                    rep.breakdown_line("CCSD(T) correlation energy:", tr.e_ccsd_tt)
                    rep.breakdown_line("CCSD(T) energy:", tr.e_ccsd_tt + e0)
                if cfg.ccsd_t_renorm or cfg.ccsd_t_comp_renorm:
                    rep.breakdown_line("R-CCSD[T] correlation energy:", tr.e_rccsd_t)
                    rep.breakdown_line("R-CCSD[T] energy:", tr.e_rccsd_t + e0)
                    if cfg.ccsd_t_paren:
                        rep.breakdown_line(
                            "R-CCSD(T) correlation energy:", tr.e_rccsd_tt
                        )
                        rep.breakdown_line("R-CCSD(T) energy:", tr.e_rccsd_tt + e0)
                    if cfg.ccsd_t_comp_renorm:
                        rep.breakdown_line(
                            "CR-CCSD[T] correlation energy:", tr.e_crccsd_t
                        )
                        rep.breakdown_line("CR-CCSD[T] energy:", tr.e_crccsd_t + e0)
                        if cfg.ccsd_t_paren:
                            rep.breakdown_line(
                                "CR-CCSD(T) correlation energy:", tr.e_crccsd_tt
                            )
                            rep.breakdown_line(
                                "CR-CCSD(T) energy:", tr.e_crccsd_tt + e0
                            )
            elif ct is CalcType.CCSD_T:
                rep.breakdown_line("CCSD(T) correlation energy:", res.e_ccsd_t)
                rep.breakdown_line("CCSD(T) energy:", res.e_ccsd_t + e0)
    if ct in (CalcType.CCSD, CalcType.CCSD_T) and cfg.restricted:
        rep.breakdown_bar()
        rep.breakdown_line("T1 diagnostic:", res.t1_diagnostic)
    if cfg.ccsd_t_renorm or cfg.ccsd_t_comp_renorm:
        rep.breakdown_line("D[T]:", res.triples.D_T)
        if cfg.ccsd_t_paren:
            rep.breakdown_line("D(T):", res.triples.D_TT)
    rep.breakdown_bar()
    rep.breakdown_line("Total electronic energy:", res.e_hf + res.e_highest)
    rep.breakdown_line("Nuclear repulsion:", res.e_nuc)
    rep.breakdown_line("Total energy:", res.e_hf + res.e_highest + res.e_nuc)
