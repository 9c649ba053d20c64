"""AO->MO ERI transformation + MP2 energy (mp2.f90:261-449).

The four O(N^5) quarter transforms (mp2.f90:320-386) are four dense
matmuls on the MXU — one `jnp.einsum` with an explicitly sequenced
contraction path.  The packed `eri_mo` repack (mp2.f90:388-410) is
skipped: the dense MO chemist tensor (pq|rs) stays in HBM and feeds
CCSD directly.

MP2 energy (mp2.f90:418-440):
    E2 = sum_{ijab} (ia|jb) [2(ia|jb) - (ib|ja)] / (e_i+e_j-e_a-e_b)
"""

from __future__ import annotations

import dataclasses
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .. import warmup
from ..config import Config
from ..io import dat
from ..io.fcidump import write_fcidump
from ..io.report import Reporter
from .hf import HFResult


@dataclasses.dataclass
class MP2Result:
    e_mp2: float
    # dense chemist (pq|rs) in the canonical MO basis; None on the
    # streaming tier (n >= STREAM_NBASIS), where `slices` + `vvvv_B`
    # carry the MO integrals instead and no dense n^4 tensor ever exists
    eri_mo: jnp.ndarray | None
    slices: object = None  # ccsd_spatial.Slices (v_vvvv=None)
    vvvv_B: object = None  # prechunk_B_chunkscaled digit form of v_vvvv


# Above this basis size the dense MO tensor + its CCSD digit forms no
# longer fit one chip's HBM (at 174 bf the dense f64 alone is 7.3 GB);
# the pipeline switches to the packed-resident streaming tier:
# methods/mo_slices.py transform, digit-limb v_vvvv, gather-digitized
# Fock consts.
STREAM_NBASIS = 140


@jax.jit
def _ao_to_mo_oneshot(eri: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    t = jnp.einsum("pi,ijkl->pjkl", C, eri)
    t = jnp.einsum("qj,pjkl->pqkl", C, t)
    t = jnp.einsum("rk,pqkl->pqrl", C, t)
    return jnp.einsum("sl,pqrl->pqrs", C, t)


@jax.jit
def _ao_to_mo_split(eri: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """The four quarter transforms as exact integer-limb int8 MXU GEMMs
    (ops/exact_gemm) — the large-basis TPU path.

    An emulated-f64 transform decomposes each n^4 operand into f32 limb
    arrays ~8x its f64 bytes (a 116-bf (n^3,n)x(n,n) stage compiles to a
    22.5 GB program — measured OOM), which round 1 dodged with host BLAS
    at 243 s of wall.  The naive hi/lo split-f32 alternative carries a
    ~sqrt(K)*2^-24 noise floor (measured 1.2e-8 Ha on a 25-bf MP2 —
    outside the contract), so this path uses the Ozaki integer-digit
    scheme instead: digit products and int32 accumulations are exact,
    leaving ~2^-49-of-scale residue (f64-grade, validated at 2e-12 Ha in
    tests/test_split_transform.py).  Each stage contracts the LEADING AO
    index against C and emits it as the TRAILING MO index, so four
    stages cycle (i,j,k,l) -> (p,q,r,s) with no final transpose:

      stage: out[rest, p] = sum_i T[i, rest] C[p, i]
             = exact_gemm(T.reshape(n, n^3).T, C.T)
    """
    n = eri.shape[0]
    from ..ops.exact_gemm import digitize_B, exact_gemm

    CB = digitize_B(C.T)  # digits + col scales, shared by all stages

    # M-block each stage (lax.map over leading-j groups): the 28 limb
    # GEMMs otherwise hold ~20 concurrent (n^3, n)-sized temporaries —
    # 18.5 GB at 116 bf (measured OOM).  f32 digit GEMMs (exact at
    # K = n <= 512) avoid XLA's u32-widened int8 lowering on skinny K.
    nb = next(d for d in range(1, n + 1) if n % d == 0 and d >= n**4 / 5e7)

    def stage(T):
        A = T.reshape(n, n**3).T  # (rest, i)
        blocks = A.reshape(nb, (n**3) // nb, n)
        out = jax.lax.map(
            lambda Ab: exact_gemm(Ab, B_dig=CB, digit_dtype=jnp.float32),
            blocks,
        )
        return out.reshape((n,) * 4)

    return stage(stage(stage(stage(eri))))


def _ao_to_mo_host(eri: np.ndarray, C: np.ndarray) -> np.ndarray:
    """The four quarter transforms as host BLAS dgemms.

    Behind the remote tunnel the device path loses twice: the AO ERI
    upload alone costs ~50 s at ~28 MB/s, and the emulated-f64 dots run
    the 0.17-TFLOP transform in *minutes* (measured 250-350 s at 116 bf
    even operand-blocked — the limb-decomposition traffic dominates).
    Host BLAS does the same f64 math in a few seconds; only the finished
    MO tensor is shipped to the device, once.

    Implementation notes, all measured on this host:
    - np.einsum falls back to its scalar C kernel for these subscripts
      even with optimize=True (>400 s per quarter transform at 116 bf);
      every stage here is an explicit BLAS matmul.
    - Exactly TWO n^4 buffers are allocated and ping-ponged (the
      reference's tmp_a/tmp_b design, mp2.f90:285-288): this microVM
      demand-faults fresh pages at ~10-50 MB/s while resident memory
      moves at ~10 GB/s, so every avoided gigabyte-scale temporary
      saves ~a minute of wall.
    - The (n,n)x(n,n^3) first stage is column-chunked: this OpenBLAS
      degrades badly on skinny GEMMs with multi-million-column N.
    - The index orders are chosen so stage 4 lands directly in
      (p,q,r,s) — no final n^4 transpose.
    """
    n = eri.shape[0]
    A = np.empty((n, n, n, n))
    B = np.empty((n, n, n, n))
    # stage 1: A[p, jkl] = sum_i C[p,i] eri[i, jkl]
    E = eri.reshape(n, n**3)
    Av = A.reshape(n, n**3)
    nc = 200_000
    for c0 in range(0, n**3, nc):
        np.matmul(C, E[:, c0 : c0 + nc], out=Av[:, c0 : c0 + nc])
    # stage 2: B[p, q, kl] = sum_j C[q,j] A[p, j, kl]   (batched over p)
    np.matmul(C[None, :, :], A.reshape(n, n, n * n), out=B.reshape(n, n, n * n))
    # stage 3: A[pq, r, l] = sum_k C[r,k] B[pq, k, l]   (batched over pq)
    np.matmul(C[None, :, :], B.reshape(n * n, n, n), out=A.reshape(n * n, n, n))
    # stage 4: B[pqr, s] = sum_l A[pqr, l] C[s,l]
    np.matmul(A.reshape(n**3, n), C.T, out=B.reshape(n**3, n))
    return B  # (p,q,r,s)


def ao_to_mo(eri: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    """(ij|kl) -> (pq|rs) with C[p, mu] (rows = MO, sys%canon_coeff layout).

    Sequenced as four quarter transforms so XLA emits four N^3xN GEMMs
    (mp2.f90:320-386) rather than one N^8 monster.  Above ~60 bf the
    emulated-f64 one-shot program's f32 limb temporaries outgrow HBM
    (24 GB at 116 bf, measured), so the transform switches to the
    split-f32 MXU formulation (_ao_to_mo_split).
    """
    n = eri.shape[0]
    if n**4 <= 2e7:  # the committed <=58-bf fixtures: one-shot is fine
        return _ao_to_mo_oneshot(eri, C)
    return _ao_to_mo_split(eri, C)


@partial(jax.jit, static_argnames=("nocc_spatial",))
def mp2_energy_spinorb(
    eri_mo: jnp.ndarray, levels: jnp.ndarray, *, nocc_spatial: int
) -> jnp.ndarray:
    """Spin-orbital MP2: E2 = 1/4 sum |<ij||ab>|^2 / D_ijab.

    Counterpart of do_mp2_spinorb (mp2.f90:82-259) — DEAD CODE upstream
    (never dispatched from main.F90:47-120; the spin-orbital pipeline
    calls do_mp2_spatial) but implemented here for inventory parity.
    Builds only the <ij||ab> slice via the spin-mask einsums
    (ops/spin.py) instead of the reference's full (2n)^4 antisymmetrised
    tensor.  Equals the spatial formulation exactly for closed-shell RHF
    references (asserted in tests/test_mp2.py)."""
    from ..ops.spin import spinorb_levels, spinorb_slice

    oovv = spinorb_slice(eri_mo, "oovv", nocc_spatial)
    lv = spinorb_levels(levels, nocc_spatial)
    nocc = 2 * nocc_spatial
    e_o, e_v = lv[:nocc], lv[nocc:]
    D = (
        e_o[:, None, None, None]
        + e_o[None, :, None, None]
        - e_v[None, None, :, None]
        - e_v[None, None, None, :]
    )
    return 0.25 * jnp.sum(oovv * oovv / D)


@partial(jax.jit, static_argnames=("nocc",))
def mp2_energy_naive(
    eri_ao: jnp.ndarray, C: jnp.ndarray, levels: jnp.ndarray, *, nocc: int
) -> jnp.ndarray:
    """Pedagogical MP2 straight from the AO integrals, one formula.

    Counterpart of do_mp2_naive (mp2.f90:9-80) — DEAD CODE upstream, the
    O(N^8) "transform every (ia|jb) element on demand" teaching version.
    The TPU-native reading keeps the naive FORMULA (no packed symmetry,
    no staged transform in user code) and lets the einsum path optimizer
    schedule it; the pedagogical value was always the formula, not the
    loop order."""
    # C rows are MOs (sys%canon_coeff layout): (ia|jb) = C_ip C_aq C_jr C_bs (pq|rs)
    ov = jnp.einsum(
        "ip,aq,jr,bs,pqrs->iajb",
        C[:nocc],
        C[nocc:],
        C[:nocc],
        C[nocc:],
        eri_ao,
        optimize=True,
    )
    e_o = levels[:nocc]
    e_v = levels[nocc:]
    denom = (
        e_o[:, None, None, None]
        + e_o[None, None, :, None]
        - e_v[None, :, None, None]
        - e_v[None, None, None, :]
    )
    exch = jnp.transpose(ov, (0, 3, 2, 1))
    return jnp.sum(ov * (2.0 * ov - exch) / denom)


@jax.jit
def mp2_energy_from_oovv(v_oovv: jnp.ndarray, levels_o, levels_v) -> jnp.ndarray:
    """MP2 energy from the physicist <ij|ab> slice: (ia|jb) = v_oovv[ijab]
    (mp2.f90:418-440 with the slice the streaming transform already has)."""
    denom = (
        levels_o[:, None, None, None]
        + levels_o[None, :, None, None]
        - levels_v[None, None, :, None]
        - levels_v[None, None, None, :]
    )
    exch = jnp.transpose(v_oovv, (0, 1, 3, 2))  # (ib|ja) = <ij|ba>
    return jnp.sum(v_oovv * (2.0 * v_oovv - exch) / denom)


@partial(jax.jit, static_argnames=("nocc",))
def mp2_energy(eri_mo: jnp.ndarray, levels: jnp.ndarray, *, nocc: int) -> jnp.ndarray:
    ov = eri_mo[:nocc, nocc:, :nocc, nocc:]  # (ia|jb)
    e_o = levels[:nocc]
    e_v = levels[nocc:]
    denom = (
        e_o[:, None, None, None]
        + e_o[None, None, :, None]
        - e_v[None, :, None, None]
        - e_v[None, None, None, :]
    )
    exch = jnp.transpose(ov, (0, 3, 2, 1))  # (ib|ja)
    return jnp.sum(ov * (2.0 * ov - exch) / denom)


def do_mp2_spatial(
    sys_: dat.System,
    ints: dat.IntStore,
    cfg: Config,
    hf: HFResult,
    rep: Reporter | None = None,
    workdir: str | Path = ".",
) -> MP2Result:
    rep = rep or Reporter()
    t_start = time.perf_counter()
    rep.section("MP2")
    rep.write(" Performing AO to MO ERI transformation...")

    n = sys_.nbasis
    nocc = sys_.nel // 2
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if (n >= STREAM_NBASIS and on_tpu) or _force_stream():
        # streaming tier: packed store -> physicist slices directly
        # (methods/mo_slices.py), v_vvvv immediately re-expressed as
        # per-chunk bf16 digit limbs and the f64 copy dropped — the only
        # route that fits 174 bf on one 16 GB chip
        from .mo_slices import ao_to_mo_slices

        # digit_L=5: every vvvv chunk becomes bf16 limbs the moment it is
        # computed — the f64 vvvv never exists in HBM.  L=5 with PER-CHUNK
        # scales truncates at ~2^-35 of each chunk's max (tighter than the
        # global-scale L=5 whose compound effect measured 8.7e-9 on the
        # N2 golden); L=6 limbs (+1.3 GB) broke the 174-bf HBM budget.
        slices, vvvv_B = ao_to_mo_slices(
            ints.packed_on_device(), jnp.asarray(hf.coeff), n=n, nocc=nocc,
            digit_L=5,
            # the transform frees the packed store the moment its row
            # table supersedes it (HBM headroom for the limb accumulation)
            free_packed=ints.free_device_packed,
        )

        rep.write(" Calculating MP2 energy...")
        lv = jnp.asarray(hf.levels)
        e_mp2 = float(mp2_energy_from_oovv(slices.v_oovv, lv[:nocc], lv[nocc:]))
        # the float() above synced the last pre-CC device program — the
        # warmup loader threads may now use the device queue
        warmup.clear_for_cc()
        rep.write(f" MP2 correlation energy (Hartree): {e_mp2:15.8f}")
        if cfg.write_fcidump:
            rep.write(" FCIDUMP skipped: no dense MO tensor on the streaming tier.")
        rep.stage_time(
            "Time taken for restricted MP2:", time.perf_counter() - t_start
        )
        return MP2Result(e_mp2=e_mp2, eri_mo=None, slices=slices, vvvv_B=vvvv_B)

    if n**4 > 2e7 and on_tpu:
        # large basis on TPU: split-f32 MXU transform over the shared
        # device ERI (uploaded packed, 8x smaller through the tunnel)
        eri_mo = _ao_to_mo_split(ints.eri_on_device(), jnp.asarray(hf.coeff))
    elif n**4 > 2e7:
        # large basis on a CPU backend: host BLAS (see _ao_to_mo_host)
        eri_mo = jnp.asarray(_ao_to_mo_host(ints.eri, hf.coeff))
    else:
        eri_mo = ao_to_mo(ints.eri_on_device(), jnp.asarray(hf.coeff))
    # nothing downstream reads the AO ERI — free the device copy (1.45 GB
    # at 116 bf) before the CC stages allocate their slices.  Below the
    # large-basis threshold the dense copy is tiny (90 MB at 58 bf) and
    # freeing it forces the NEXT pipeline pass in this process to re-ship
    # it through the ~28 MB/s tunnel (~0.5 s of the measured 0.69 s
    # steady mp2_wall), so keep it cached where HBM pressure is nil
    if n >= 100:
        ints.free_device_eri()

    rep.write(" Calculating MP2 energy...")
    e_mp2 = float(mp2_energy(eri_mo, jnp.asarray(hf.levels), nocc=nocc))
    # the float() above synced the last pre-CC device program — open the
    # warmup foreground gate (loader threads may now issue their loads)
    warmup.clear_for_cc()

    rep.write(f" MP2 correlation energy (Hartree): {e_mp2:15.8f}")

    if cfg.write_fcidump:
        rep.write(" Writing FCIDUMP file...")
        write_fcidump(Path(workdir) / "FCIDUMP", np.asarray(eri_mo))
        rep.write(" Done writing FCIDUMP file!")

    rep.stage_time("Time taken for restricted MP2:", time.perf_counter() - t_start)
    return MP2Result(e_mp2=e_mp2, eri_mo=eri_mo)


def _force_stream() -> bool:
    """AFESP_FORCE_STREAM=1: route any size through the streaming tier —
    test/validation hook (the CPU suite exercises the tier at small n)."""
    import os

    return os.environ.get("AFESP_FORCE_STREAM", "") == "1"
