"""Restricted Hartree-Fock with DIIS (hf.f90:21-151).

The per-iteration sequence replicates do_rhf exactly so that SCF
trajectories (and hence the energies at the convergence iteration) match
the reference to roundoff:

  F' = X^T F X -> eigh -> C = (X C')^T -> D = C_occ^T C_occ
  -> E = sum(D*(Hcore+F)), convergence on (dE, ||dD||_F)
  -> fresh Fock from D -> DIIS extrapolation of F.

Device placement: at the reference's scale (nbasis <= ~100) SCF is
latency-bound, and — measured on v5e — the TPU QDWH eigensolver carries
~1e-6 eigenvector error under f64 emulation, far outside the 1e-8 Ha
accuracy contract.  So the SCF loop runs on host LAPACK/numpy (exactly
the dsyev/dgemm semantics of the reference).

Large-basis TPU path (nbasis >= _TPU_FOCK_NBASIS): the packed ERI is
shipped once (8x smaller through the tunnel), unpacked on device, and
digitized ONCE into integer-limb form; then

1. `_scf_prelude_device` — ONE dispatch that runs the whole
   far-from-convergence phase on device: eigensolve-free densities via
   canonical purification (`purify_density`), exact digit-GEMM Fock
   builds, on-device Pulay DIIS, converging to the f64 stationary
   point (the host loop's own fixed point — same Fock map);
2. the host loop below polishes/validates at the els.in tolerances
   with host LAPACK eigensolves, downloading only the packed upper
   Fock triangle per iteration (`_fock_build_split`), ~2-5 iterations.

On a large-n CPU backend the two Fock contractions run as host BLAS
gemv's over a one-time (ik|jl) re-sort instead.  The FLOP-heavy stages
(CCSD, triples) always run on TPU.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
from functools import partial
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..io import dat
from ..io.report import Reporter

# Basis-size threshold above which the Fock build uses a large-n fast
# path: device einsums over a resident ERI (direct-attached TPU) or two
# host BLAS gemv's over a one-time (ik|jl) re-sort (remote tunnel) —
# see the module docstring for the measured rationale.
_TPU_FOCK_NBASIS = 100


def _prof(label: str, t0: float) -> float:
    """AFESP_HF_PROFILE=1: per-phase SCF wall breakdown to stderr."""
    t1 = time.perf_counter()
    if os.environ.get("AFESP_HF_PROFILE"):
        print(f"[hf-prof] {label}: {t1 - t0:.3f}s", file=sys.stderr, flush=True)
    return t1


def device_is_remote_tunnel() -> bool:
    """True when the TPU is reached through the axon tunnel (slow
    host<->device link: ~28 MB/s up, ~0.5 MB/s down, measured 2026-08).
    Drives the large-n placement decisions in HF and the MP2 transform.

    The tunnel registers a plugin named "axon" but its devices report
    platform "tpu", so the platform *list* is the detectable signal."""
    return "axon" in (jax.config.jax_platforms or "")


@dataclasses.dataclass
class HFResult:
    e_hf: float  # electronic energy (E_nuc added only in the report)
    coeff: np.ndarray  # canonical MO coefficients, rows = MO (sys%canon_coeff)
    levels: np.ndarray  # orbital energies ascending (sys%canon_levels)
    ao_fock: np.ndarray  # the AO Fock diagonalised at convergence
    converged: bool
    iterations: int


@jax.jit
def fock_build_jax(H, eri, D, eri_K=None):
    """F = Hcore + 2J - K on the MXU (replaces the packed-ERI OpenMP loop,
    hf.f90:349-385)."""
    J = jnp.einsum("ijkl,kl->ij", eri, D)
    if eri_K is None:
        K = jnp.einsum("ikjl,kl->ij", eri, D)
    else:
        K = jnp.einsum("ijkl,kl->ij", eri_K, D)
    return H + 2.0 * J - K


@jax.jit
def _fock_split_consts(eri):
    """One-time int8 digitization (ops/exact_gemm) of the Coulomb
    (ij|kl) and exchange (ik|jl) ERI matricisations for the exact-GEMM
    Fock build.  An emulated-f64 einsum over the n^4 tensor decomposes
    the operand into f32 limb arrays ~8x its f64 bytes on EVERY call;
    digitizing once costs 7 int8 limbs = 7 bytes/element (LESS than the
    f64 original) and every Fock build runs at int8-MXU rate."""
    from ..ops.exact_gemm import digitize_A

    n = eri.shape[0]
    Em = eri.reshape(n * n, n * n)
    Km = jnp.transpose(eri, (0, 2, 1, 3)).reshape(n * n, n * n)
    return digitize_A(Em), digitize_A(Km)


@partial(jax.jit, static_argnames=("packed_f32",))
def _fock_build_split(H, D, consts, iu=None, packed_f32=False):
    """F = Hcore + 2J - K with J/K as exact integer-limb int8 MXU GEMVs
    over the pre-digitized ERI matricisations — f64-grade (~2^-49 of
    scale, tests/test_split_transform.py), so large-basis SCF carries no
    precision penalty versus the <=58-bf host trajectory path.

    With `iu` (upper-triangle index pair), returns only the packed upper
    triangle: F is symmetric, and through the axon tunnel (~0.5 MB/s
    down) halving the per-iteration download is the dominant SCF loop
    saving.  packed_f32 additionally downcasts the packed result — used
    for early SCF iterations far from convergence, where ~1e-7 relative
    Fock noise is invisible next to the ~1e-1..1e-4 density error and
    DIIS operates on the f64 reconstruction regardless (the converged
    stationary point is pinned by the final f64 iterations)."""
    from ..ops.exact_gemm import exact_gemm

    n = H.shape[0]
    d = D.reshape(-1, 1)
    J = exact_gemm(B=d, A_dig=consts[0]).reshape(n, n)
    K = exact_gemm(B=d, A_dig=consts[1]).reshape(n, n)
    F = H + 2.0 * J - K
    if iu is None:
        return F
    Fp = F[iu[0], iu[1]]
    return Fp.astype(jnp.float32) if packed_f32 else Fp


def _tri_rows(npair: int, ncols: int, budget_elems: float = 1.6e8) -> int:
    """Largest divisor of npair whose (rows, ncols) f64 gather block fits
    the budget — the stream-consts builders digitize row-blockwise."""
    cap = max(1, int(budget_elems / ncols))
    return max(d for d in range(1, npair + 1) if npair % d == 0 and d <= cap)


@partial(jax.jit, static_argnames=("n", "L"))
def _fock_stream_consts(packed, tk, tl, *, n: int, L: int = 6):
    """Stream-tier Fock constants, built by GATHER from the tri-packed
    store — the >=STREAM_NBASIS replacement for _fock_split_consts,
    which needs the dense (n,n,n,n) tensor (7.3 GB at 174 bf) plus
    full-square digitizations (12.9 GB).  Here:

      J: the symmetric pair matrix P2[p,q] = (ij|kl) over TRI pair
         indices p=(i>=j), q=(k>=l) — n^4/4 elements;
      K: tri ROWS p=(i>=j) of the exchange matricisation (ik|jl) over
         full columns (k,l) — n^4/2 elements (F is symmetric, so tri
         rows suffice; the build scatters back to full).

    Both digitized row-blockwise to int8 limbs with per-row scales
    (L=6: ~2^-42-of-scale, f64-grade for the SCF loop), 6+3 = 9 B per
    held element ~= 4.2 GB at 174 bf vs _fock_split_consts' 12.9 GB.
    Index arithmetic is the reference's eri_ind (integrals.f90:196-210),
    int32-exact for n <= 300."""
    from ..ops.exact_gemm import digitize_A

    npair = n * (n + 1) // 2
    i32 = jnp.int32

    def pair(x, y):
        lo, hi = jnp.minimum(x, y), jnp.maximum(x, y)
        return hi * (hi + 1) // 2 + lo

    q = jnp.arange(npair, dtype=i32)
    kk = jnp.arange(n, dtype=i32)
    kl_flat = pair(kk[:, None], kk[None, :]).reshape(-1)  # (n^2,)

    bj = _tri_rows(npair, npair)

    def j_block(p0):
        rows = p0 + jnp.arange(bj, dtype=i32)
        blk = packed[pair(rows[:, None], q[None, :])]
        d, s = digitize_A(blk, L)
        return d, s

    Jd, Js = jax.lax.map(j_block, jnp.arange(npair // bj, dtype=i32) * bj)
    J_dig = ([d.reshape(npair, npair) for d in Jd], Js.reshape(npair, 1))

    bk = _tri_rows(npair, n * n)

    def k_block(p0):
        rows = p0 + jnp.arange(bk, dtype=i32)
        ik = pair(tk[rows][:, None], kk[None, :])  # (bk, n) pair(i,k)
        jl = pair(tl[rows][:, None], kk[None, :])  # (bk, n) pair(j,l)
        idx = pair(ik[:, :, None], jl[:, None, :])  # (bk, n, n) -> (ik|jl)
        blk = packed[idx].reshape(bk, n * n)
        d, s = digitize_A(blk, L)
        return d, s

    Kd, Ks = jax.lax.map(k_block, jnp.arange(npair // bk, dtype=i32) * bk)
    K_dig = ([d.reshape(npair, n * n) for d in Kd], Ks.reshape(npair, 1))
    return J_dig, K_dig


@partial(jax.jit, static_argnames=("packed_f32",))
def _fock_build_stream(H, D, consts, tk, tl, iu=None, packed_f32=False):
    """F = Hcore + 2J - K from the stream consts (_fock_stream_consts):
    J as a tri-pair GEMV with symmetry-weighted density (off-diagonal
    pairs count twice), K as a tri-row GEMV over the full density, both
    exact integer-limb digit GEMMs; the symmetric full matrices are
    scattered back from their triangles.  Same download contract as
    _fock_build_split (packed upper triangle via iu)."""
    from ..ops.exact_gemm import exact_gemm

    n = H.shape[0]
    J_dig, K_dig = consts
    w = jnp.where(tk == tl, 1.0, 2.0) * D[tk, tl]
    Jt = exact_gemm(B=w[:, None], A_dig=J_dig)[:, 0]
    Kt = exact_gemm(B=D.reshape(-1, 1), A_dig=K_dig)[:, 0]
    J = jnp.zeros((n, n)).at[tk, tl].set(Jt).at[tl, tk].set(Jt)
    K = jnp.zeros((n, n)).at[tk, tl].set(Kt).at[tl, tk].set(Kt)
    F = H + 2.0 * J - K
    if iu is None:
        return F
    Fp = F[iu[0], iu[1]]
    return Fp.astype(jnp.float32) if packed_f32 else Fp


def purify_density(Fp, *, nocc, tol=1e-14, maxiter=100):
    """Occupied-subspace projector of a symmetric (orthogonal-basis) Fock
    by Palser–Manolopoulos canonical purification (PM98) — NO
    eigendecomposition, just a fixed point of ~3 small matmuls per step.

    Why: jnp.linalg.eigh inside a jitted loop makes the program's
    first execution through the axon tunnel catastrophically slow
    (measured 267 s for a 40-step eigh while_loop vs 3.6 s for a matmul
    loop of the same trip count — the QDWH graph explodes the
    server-side program build).  Purification lowers to a handful of
    dots, runs in emulated f64 (no f32 eigenvector floor), and the SCF
    prelude only needs D, never eigenvectors.

    D0 = (lam/m)(mu I - Fp) + (nocc/m) I with Gershgorin bounds keeps
    spec(D0) in [0,1] and tr = nocc; each step applies the trace-
    preserving cubic; converges once the spectrum polarises to {0,1}.
    """
    m = Fp.shape[0]
    diag = jnp.diagonal(Fp)
    r = jnp.sum(jnp.abs(Fp), axis=1) - jnp.abs(diag)
    fmin = jnp.min(diag - r)
    fmax = jnp.max(diag + r)
    mu = jnp.trace(Fp) / m
    # a (near-)uniform spectrum makes fmax-mu / mu-fmin underflow to 0 and
    # D0 NaN, which silently disables the loop predicates; clamping keeps
    # D0 finite (any positive lam works — D0 just needs spec in [0,1])
    tiny = jnp.float64(1e-300)
    lam = jnp.minimum(
        nocc / jnp.maximum(fmax - mu, tiny),
        (m - nocc) / jnp.maximum(mu - fmin, tiny),
    )
    eye = jnp.eye(m)
    D0 = (lam / m) * (mu * eye - Fp) + (nocc / m) * eye

    def cond(c):
        return (c[2] > tol * m) & (c[1] < maxiter)

    def body(c):
        D, i, _ = c
        D2 = D @ D
        D3 = D2 @ D
        t_hi = jnp.trace(D2 - D3)
        t_lo = jnp.trace(D - D2)
        cn = t_hi / jnp.where(jnp.abs(t_lo) > 1e-300, t_lo, 1e-300)
        up_lo = ((1.0 - 2.0 * cn) * D + (1.0 + cn) * D2 - D3) / (1.0 - cn)
        up_hi = ((1.0 + cn) * D2 - D3) / cn
        Dn = jnp.where(cn <= 0.5, up_lo, up_hi)
        return Dn, i + 1, jnp.abs(t_lo)

    D, n_it, _ = jax.lax.while_loop(
        cond, body, (D0, jnp.int32(0), jnp.float64(1.0))
    )
    # PM's canonical ratio c_n = tr(D^2-D^3)/tr(D-D^2) is a 0/0 near the
    # projector and stalls at ~sqrt(eps) (measured: plateau at 5e-8
    # regardless of iteration budget).  Two trailing McWeeny steps
    # (3D^2 - 2D^3, unconditionally quadratic near a projector) finish
    # to f64: 5e-8 -> ~1e-14; the trace drift they introduce is O(err^2).
    for _ in range(2):
        D2 = D @ D
        D = 3.0 * D2 - 2.0 * D2 @ D
    return D, n_it


@partial(jax.jit, static_argnames=("nocc", "nerr", "maxiter", "stream"))
def _scf_prelude_device(
    H, S, X, consts, iu, tk=None, tl=None, *, nocc, nerr, maxiter,
    stream: bool = False,
):
    """Device-resident DIIS SCF prelude: one XLA dispatch that iterates
    F' = X^T F X -> purified density -> exact-GEMM Fock -> on-device
    Pulay DIIS until the density rms reaches ~1e-8.

    Purpose: through the axon tunnel every host-loop iteration pays a
    dispatch + an F download (~0.1-5 s, load-dependent); this folds the
    ~15-25 far-from-convergence iterations into ONE round trip.  The
    density comes from eigensolve-free canonical purification (see
    purify_density — f64 matmuls only), the Fock build from f64-grade
    digit GEMMs, so the prelude converges to the true f64 stationary
    point.  It is used purely as the host loop's initial guess — do_rhf
    then polishes/validates at the els.in tolerances with host LAPACK,
    so converged energies are independent of this prelude (same fixed
    point, different starting guess; the tightened large-n tolerances
    pin it).

    Returns (packed upper triangle of the last Fock, iterations run).
    """
    from ..ops.cc_step import gauss_solve
    from ..ops.exact_gemm import exact_gemm

    n = H.shape[0]

    if stream:

        def fock(D):
            return _fock_build_stream(H, D, consts, tk, tl)

    else:

        def fock(D):
            d = D.reshape(-1, 1)
            J = exact_gemm(B=d, A_dig=consts[0]).reshape(n, n)
            K = exact_gemm(B=d, A_dig=consts[1]).reshape(n, n)
            return H + 2.0 * J - K

    def cond(carry):
        return (~carry[-1]) & (carry[-2] < maxiter)

    def body(carry):
        F, D_old, E_old, Fh, Eh, gram, slot, nact, F_best, best, it, _done = carry
        Fp = X.T @ F @ X
        D_orth, _ = purify_density(Fp, nocc=nocc)
        D = X @ D_orth @ X.T
        E = jnp.sum(D * (H + F))
        rms = jnp.sqrt(jnp.sum((D - D_old) ** 2))
        # rms scores the Fock this iteration ENTERED with; keep the best.
        # Once the DIIS Gram goes singular at convergence (ok=False
        # below) the fallback is the bare Roothaan map, which can drift
        # slowly AWAY — returning the best iterate makes the prelude
        # monotone regardless of where maxiter lands.
        better = rms < best
        F_best = jnp.where(better, F, F_best)
        best = jnp.where(better, rms, best)
        # 1e-8 matches the tightened large-n els.in d_tol; the dE gate
        # sits at the DIIS stall floor (the host polish enforces the
        # real e_tol in f64)
        done = (rms < 1e-8) & (jnp.abs(E - E_old) < 1e-7)
        Fn = fock(D)
        err = (Fn @ D @ S - S @ D @ Fn).ravel()
        slot = (slot + 1) % nerr
        nact = jnp.minimum(nact + 1, nerr)
        Fh = Fh.at[slot].set(Fn.ravel())
        Eh = Eh.at[slot].set(err)
        row = jnp.sum(Eh * err[None, :], axis=1)
        gram = gram.at[slot, :].set(row).at[:, slot].set(row)
        active = jnp.arange(nerr) < nact
        both = active[:, None] & active[None, :]
        M = jnp.zeros((nerr + 1, nerr + 1))
        M = M.at[:nerr, :nerr].set(jnp.where(both, gram, jnp.eye(nerr)))
        M = M.at[nerr, :nerr].set(jnp.where(active, -1.0, 0.0))
        M = M.at[:nerr, nerr].set(jnp.where(active, -1.0, 0.0))
        rhs = jnp.zeros(nerr + 1).at[nerr].set(-1.0)
        c, ok = gauss_solve(M, rhs)
        extrap = jnp.sum(c[:nerr, None] * Fh, axis=0).reshape(n, n)
        Fn = jnp.where((nact >= 2) & ok, extrap, Fn)
        return (Fn, D, E, Fh, Eh, gram, slot, nact, F_best, best, it + 1, done)

    carry = (
        H,
        jnp.zeros((n, n)),
        jnp.float64(0.0),
        jnp.zeros((nerr, n * n)),
        jnp.zeros((nerr, n * n)),
        jnp.zeros((nerr, nerr)),
        jnp.int32(-1),
        jnp.int32(0),
        H,
        jnp.float64(jnp.inf),
        jnp.int32(0),
        jnp.bool_(False),
    )
    carry = jax.lax.while_loop(cond, body, carry)
    return carry[8][iu[0], iu[1]], carry[-2]


def _build_fock(
    H: np.ndarray,
    eri: np.ndarray,
    D: np.ndarray,
    fock_consts=None,
    eri_K_host: np.ndarray | None = None,
) -> np.ndarray:
    if fock_consts is not None:
        return np.asarray(
            _fock_build_split(jnp.asarray(H), jnp.asarray(D), fock_consts)
        )
    n = H.shape[0]
    J = (eri.reshape(n * n, n * n) @ D.ravel()).reshape(n, n)
    if eri_K_host is not None:
        K = (eri_K_host.reshape(n * n, n * n) @ D.ravel()).reshape(n, n)
    else:
        K = np.einsum("ikjl,kl->ij", eri, D, optimize=True)
    return H + 2.0 * J - K


class _DiisHost:
    """Host-side Pulay DIIS over Fock matrices (hf.f90:197-266)."""

    def __init__(self, n_errmat: int, shape):
        self.use_diis = n_errmat >= 2
        self.n_errmat = n_errmat
        self.n_active = 0
        self.slot = -1
        if self.use_diis:
            self.F = np.zeros((n_errmat,) + shape)
            self.E = np.zeros((n_errmat,) + shape)

    def update(self, F: np.ndarray, err: np.ndarray) -> np.ndarray | None:
        if not self.use_diis:
            return None
        self.slot = (self.slot + 1) % self.n_errmat
        self.n_active = min(self.n_active + 1, self.n_errmat)
        self.F[self.slot] = F
        self.E[self.slot] = err
        n = self.n_active
        if n < 2:  # `if (n > 1)` guard, hf.f90:216
            return None
        B = np.zeros((n + 1, n + 1))
        for i in range(n):
            for j in range(i + 1):
                B[i, j] = B[j, i] = np.sum(self.E[i] * self.E[j])
        B[n, :n] = -1.0
        B[:n, n] = -1.0
        rhs = np.zeros(n + 1)
        rhs[n] = -1.0
        c = np.linalg.solve(B, rhs)
        return np.tensordot(c[:n], self.F[:n], axes=1)


def symmetric_orthogonaliser_np(S: np.ndarray) -> np.ndarray:
    """X = S^{-1/2} = U s^{-1/2} U^T (hf.f90:48-66, Szabo-Ostlund 3.167)."""
    s, U = np.linalg.eigh(S)
    return (U / np.sqrt(s)) @ U.T


def do_rhf(
    sys_: dat.System,
    ints: dat.IntStore,
    cfg: Config,
    rep: Reporter | None = None,
    workdir: str | Path = ".",
) -> HFResult:
    rep = rep or Reporter()
    rep.section("Restricted Hartree-Fock")
    t_start = time.perf_counter()

    n = sys_.nbasis
    nocc = sys_.nel // 2  # hf.f90:105 uses nel/2 regardless of path

    S = ints.ovlp
    H = ints.core_hamil
    eri = ints.eri
    fock_consts = eri_K_host = None
    stream = False
    tk_dev = tl_dev = None
    tp = time.perf_counter()
    if n >= _TPU_FOCK_NBASIS and (eri is not None or ints.eri_packed is not None):
        from .mp2 import STREAM_NBASIS, _force_stream

        if jax.default_backend() in ("tpu", "axon") or _force_stream():
            stream = n >= STREAM_NBASIS or _force_stream()
            if stream:
                # packed-resident tier: J/K consts gathered + digitized
                # straight from the tri-packed store — no dense tensor
                packed_dev = ints.packed_on_device()
                jax.block_until_ready(packed_dev)
                tp = _prof("packed upload", tp)
                tk_host, tl_host = np.tril_indices(n)
                tk_dev = jnp.asarray(tk_host.astype(np.int32))
                tl_dev = jnp.asarray(tl_host.astype(np.int32))
                fock_consts = _fock_stream_consts(packed_dev, tk_dev, tl_dev, n=n)
                jax.block_until_ready(fock_consts[0][1])
                tp = _prof("fock stream digitize", tp)
            else:
                # split-f32 MXU Fock path: packed upload (8x smaller
                # through the tunnel) + one-time device pre-split of the
                # J/K matricisations; every Fock build is then two
                # native-f32 split GEMVs instead of host BLAS or
                # emulated-f64 einsums
                eri_dev = ints.eri_on_device()
                jax.block_until_ready(eri_dev)
                tp = _prof("eri upload+unpack", tp)
                fock_consts = _fock_split_consts(eri_dev)
                jax.block_until_ready(fock_consts)
                tp = _prof("fock digitize", tp)
            H_dev = jnp.asarray(H)
            iu_host = np.triu_indices(n)
            iu_dev = (jnp.asarray(iu_host[0]), jnp.asarray(iu_host[1]))
        else:
            # large-n CPU backend: one-time (ik|jl) re-sort so every
            # Fock build is two host dgemv's
            eri_K_host = np.ascontiguousarray(eri.transpose(0, 2, 1, 3))
            tp = _prof("eri_K resort", tp)
    X = symmetric_orthogonaliser_np(S)
    tp = _prof("orthogonaliser", tp)

    prelude_guess = False
    if cfg.scf_read_guess:
        rep.write(" Reading previous AO Fock matrix as guess...")
        F = dat.read_scf_guess(Path(workdir) / "guess_in.dat", n)
    elif fock_consts is not None:
        # large-n TPU: device-resident DIIS prelude folds the
        # far-from-convergence iterations into one dispatch; the host
        # loop below polishes to the exact f64 stationary point
        # DIIS-off configs (n_errmat < 2, mirroring _DiisHost's guard)
        # still benefit from the one-dispatch prelude; clamp the ring to
        # 2 slots — with nerr=0 the slot arithmetic is a traced mod-by-
        # zero and the history shapes are degenerate
        fp, pre_iters = _scf_prelude_device(
            H_dev, jnp.asarray(S), jnp.asarray(X), fock_consts, iu_dev,
            tk_dev, tl_dev,
            nocc=nocc, nerr=max(cfg.scf_diis_n_errmat, 2),
            maxiter=min(cfg.scf_maxiter, 40), stream=stream,
        )
        fp = np.asarray(fp, dtype=np.float64)
        F = np.empty((n, n))
        F[iu_host] = fp
        F.T[iu_host] = fp
        if not np.isfinite(F).all():  # diverged prelude: fall back
            F = H.copy()
        else:
            prelude_guess = True
            rep.write(
                f" Device SCF prelude: {int(pre_iters)} iterations."
            )
        tp = _prof("device prelude", tp)
    else:
        # Core-Hamiltonian guess (hf.f90:78-81)
        F = H.copy()

    diis = _DiisHost(cfg.scf_diis_n_errmat, (n, n))

    rep.scf_table_header()
    D_old = np.zeros((n, n))
    energy_old = 0.0
    converged = False
    result = None
    t0 = time.perf_counter()

    acc_host = acc_fock = acc_diis = 0.0
    for it in range(1, cfg.scf_maxiter + 1):
        tit = time.perf_counter()
        Fp = X.T @ F @ X
        w, Cp = np.linalg.eigh(Fp)
        C = (X @ Cp).T  # rows = MO index (hf.f90:102)
        D = C[:nocc].T @ C[:nocc]
        energy = float(np.sum(D * (H + F)))
        rms = float(np.sqrt(np.sum((D - D_old) ** 2)))
        acc_host += time.perf_counter() - tit
        t1 = time.perf_counter()
        rep.scf_row(it, energy, energy - energy_old, rms, t1 - t0)
        t0 = t1

        if rms < cfg.scf_d_tol and abs(energy - energy_old) < cfg.scf_e_tol:
            converged = True
            rep.table_close()
            rep.write(" Convergence reached within tolerance.")
            rep.write(f" Final SCF Energy (Hartree): {energy:15.8f}")
            rep.write(" Orbital energies (Hartree):")
            for i in range(n, 0, -1):
                rep.write(f" {i:3d} {w[i-1]:15.8f}")
            result = HFResult(
                e_hf=energy,
                coeff=C,
                levels=w,
                ao_fock=F,
                converged=True,
                iterations=it,
            )
            if cfg.scf_write_guess:
                rep.write(" Writing AO Fock matrix for future use...")
                dat.write_scf_guess(Path(workdir) / "guess_out.dat", F)
            break

        energy_old = energy
        D_old = D
        tit = time.perf_counter()
        if fock_consts is not None:
            # packed symmetric download (and f32 while far from
            # convergence): the tunnel's ~0.5 MB/s download makes the
            # per-iteration Fock retrieval the SCF loop's dominant cost.
            # Never downcast when the prelude already converged the
            # guess — f32 noise would just cost ~6 re-convergence
            # iterations (the iteration-1 rms vs D_old=0 is meaningless)
            early = rms > 1e-3 and not prelude_guess
            if stream:
                fp = np.asarray(
                    _fock_build_stream(
                        H_dev, jnp.asarray(D), fock_consts, tk_dev, tl_dev,
                        iu_dev, packed_f32=early,
                    ),
                    dtype=np.float64,
                )
            else:
                fp = np.asarray(
                    _fock_build_split(
                        H_dev, jnp.asarray(D), fock_consts, iu_dev,
                        packed_f32=early,
                    ),
                    dtype=np.float64,
                )
            F = np.empty((n, n))
            F[iu_host] = fp
            F.T[iu_host] = fp
        else:
            F = _build_fock(H, eri, D, fock_consts, eri_K_host)
        acc_fock += time.perf_counter() - tit
        tit = time.perf_counter()
        err = F @ D @ S - S @ D @ F  # DIIS error (hf.f90:212-213)
        extrap = diis.update(F, err)
        if extrap is not None:
            F = extrap
        acc_diis += time.perf_counter() - tit

    if not converged:
        # Warn-and-continue, matching hf.f90:144-146 (does NOT abort)
        rep.write(" Convergence not reached, please increase maxiter.")
        result = HFResult(
            e_hf=energy,
            coeff=C,
            levels=w,
            ao_fock=F,
            converged=False,
            iterations=cfg.scf_maxiter,
        )

    if os.environ.get("AFESP_HF_PROFILE"):
        print(
            f"[hf-prof] loop totals over {result.iterations} iters: "
            f"host-eigh {acc_host:.3f}s, fock {acc_fock:.3f}s, "
            f"diis {acc_diis:.3f}s",
            file=sys.stderr,
            flush=True,
        )
    rep.stage_time(
        "Time taken for restricted Hartree-Fock:", time.perf_counter() - t_start
    )
    return result
