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

from ..config import Config
from ..io import dat
from ..io.fcidump import write_fcidump
from ..io.report import Reporter
from .hf import HFResult


@dataclasses.dataclass
class MP2Result:
    e_mp2: float
    eri_mo: jnp.ndarray  # dense chemist (pq|rs) in the canonical MO basis


@jax.jit
def _ao_to_mo_oneshot(eri: jnp.ndarray, C: jnp.ndarray) -> jnp.ndarray:
    t = jnp.einsum("pi,ijkl->pjkl", C, eri)
    t = jnp.einsum("qj,pjkl->pqkl", C, t)
    t = jnp.einsum("rk,pqkl->pqrl", C, t)
    return jnp.einsum("sl,pqrl->pqrs", C, t)


@partial(jax.jit, static_argnames=("blk",))
def _ao_to_mo_chunked(eri: jnp.ndarray, C: jnp.ndarray, *, blk: int) -> jnp.ndarray:
    """The four quarter transforms with every dot_general's OPERANDS
    sliced to n^3*blk (two lax.map stages).

    TPU f64 dot_generals are emulated by decomposing each operand into
    f32/bf16 limb arrays ~4x the f64 bytes, with remat copies on top: a
    116-bf one-shot transform compiles to a 24.4 GB program (measured —
    55% over a v5e's HBM), and any n^4 operand in a dot blows up the
    same way no matter how the output is blocked.  So:

      stage A (per l-block):  (ij|k lb) -> (pq|r lb)   [transforms 1-3;
          l is a free index, so the eri operand slices cleanly]
      stage B (per p-block):  (pb q|r l) -> (pb q|rs)  [transform 4
          contracts l, but p is now free so the operand slices]

    Peak HBM: eri + the intermediate + the output (3 x n^4 f64) plus
    ~4x n^3*blk of emulation temps, instead of ~4 x 4x n^4.
    """
    n = eri.shape[0]

    def stage_a(l0):
        e = jax.lax.dynamic_slice_in_dim(eri, l0, blk, axis=3)
        t = jnp.einsum("pi,ijkl->pjkl", C, e)
        t = jnp.einsum("qj,pjkl->pqkl", C, t)
        return jnp.einsum("rk,pqkl->pqrl", C, t)

    u = jax.lax.map(stage_a, jnp.arange(0, n, blk))  # (nb, n,n,n, blk)
    u = jnp.moveaxis(u, 0, 3).reshape(n, n, n, n)  # (p,q,r,l)

    def stage_b(p0):
        up = jax.lax.dynamic_slice_in_dim(u, p0, blk, axis=0)
        return jnp.einsum("sl,pqrl->pqrs", C, up)

    out = jax.lax.map(stage_b, jnp.arange(0, n, blk))  # (nb, blk, n,n,n)
    return out.reshape(n, n, n, n)


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
    transform runs operand-blocked (see _ao_to_mo_chunked) so the
    f64-emulation transients stay bounded.
    """
    n = eri.shape[0]
    if n**4 <= 2e7:  # the committed <=58-bf fixtures: one-shot is fine
        return _ao_to_mo_oneshot(eri, C)
    # largest divisor of n keeping blk*n^3 operand slices under ~100 MB f64
    budget = max(1, int(12e6 / n**3))
    blk = max(d for d in range(1, budget + 1) if n % d == 0)
    return _ao_to_mo_chunked(eri, C, blk=blk)


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

    from .hf import device_is_remote_tunnel

    n = sys_.nbasis
    if n**4 > 2e7 and device_is_remote_tunnel():
        # large basis behind the slow tunnel: transform on host, ship
        # the MO tensor once (see _ao_to_mo_host)
        eri_mo = jnp.asarray(_ao_to_mo_host(ints.eri, hf.coeff))
    else:
        eri_mo = ao_to_mo(ints.eri_on_device(), jnp.asarray(hf.coeff))

    rep.write(" Calculating MP2 energy...")
    nocc = sys_.nel // 2
    e_mp2 = float(mp2_energy(eri_mo, jnp.asarray(hf.levels), nocc=nocc))

    rep.write(f" MP2 correlation energy (Hartree): {e_mp2:15.8f}")

    if cfg.write_fcidump:
        rep.write(" Writing FCIDUMP file...")
        write_fcidump(Path(workdir) / "FCIDUMP", np.asarray(eri_mo))
        rep.write(" Done writing FCIDUMP file!")

    rep.stage_time("Time taken for restricted MP2:", time.perf_counter() - t_start)
    return MP2Result(e_mp2=e_mp2, eri_mo=eri_mo)
