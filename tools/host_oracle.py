"""Independent host-f64 HF + MP2 oracle for the >=100-bf fixtures.

The reference validates by external-oracle comparison (SURVEY.md §4),
but its packed store caps near 99 basis functions (integrals.f90:10-21)
— above that the repo was its own only witness (round-4 verdict,
missing #2): every 1e-8 energy gate lived at <=58 bf while the 116/174-bf
tiers stack the most aggressive machinery (digit GEMMs at per-spec L,
streaming transform, purification prelude) with no independent
end-to-end number to land on.

This tool is that witness: a SELF-CONTAINED dense-f64 numpy RHF (DIIS)
+ MP2 that shares only the *data loading* with the package (fixed-width
.dat parsers, the raw packed eri.npy) — the ERI unpack, Fock builds,
orthogonaliser, SCF, MO transform and MP2 sum are all implemented here
from scratch in numpy.  Dense n^4 at 174 bf is 7.3 GB — trivially
host-feasible on this 125 GB box, just slow (single core), which is
exactly why it is an offline oracle and not a pipeline stage.

Writes `<fixture>/oracle.json`; bench_large.py / bench_xl.py gate their
TPU e_hf / e_mp2_corr against it at 1e-8.

Usage:  python tools/host_oracle.py data/h2o-dimer-cc-pvtz [more dirs]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from afesp_tpu.io.dat import (  # data loading only — all math is local
    nuclear_repulsion,
    read_dat_matrix,
    read_geometry,
)


def unpack_dense(packed: np.ndarray, n: int) -> np.ndarray:
    """8-fold packed (reference eri_ind order: tri(ij)+kl, ij>=kl,
    pair = tri(max)+min) -> dense (n,n,n,n) chemist (mu nu|la si).
    Row-chunked int64 index math, independent of ops/packed_eri."""
    idx = np.arange(n, dtype=np.int64)
    pk = (
        np.maximum(idx[:, None], idx[None, :])
        * (np.maximum(idx[:, None], idx[None, :]) + 1)
        // 2
        + np.minimum(idx[:, None], idx[None, :])
    )  # (n, n) pair indices
    out = np.empty((n, n, n, n))
    for i in range(n):
        pij = pk[i][:, None, None]          # (n,1,1)
        lo = np.minimum(pij, pk[None])      # (n,n,n)
        hi = np.maximum(pij, pk[None])
        out[i] = packed[hi * (hi + 1) // 2 + lo]
    return out


def rhf(S, H, eri, nocc, max_iter=200, tol=1e-12):
    """Dense-f64 RHF with DIIS on the FDS-SDF residual.  Returns
    (E_elec, C, eps, n_iter, converged)."""
    w, U = np.linalg.eigh(S)
    X = U @ np.diag(w**-0.5) @ U.T          # Löwdin S^(-1/2)
    n = S.shape[0]
    n2 = n * n

    def diag_fock(F):
        Fp = X @ F @ X
        eps, Cp = np.linalg.eigh(Fp)
        return eps, X @ Cp

    eps, C = diag_fock(H)
    D = 2.0 * C[:, :nocc] @ C[:, :nocc].T   # closed-shell density
    eriJ = eri.reshape(n2, n2)              # (mu nu | la si)
    eriK = np.ascontiguousarray(
        eri.transpose(0, 2, 1, 3).reshape(n2, n2)
    )  # (mu la | nu si) rows (mu,nu)

    errs, focks = [], []
    e_old = 0.0
    for it in range(1, max_iter + 1):
        J = (eriJ @ D.reshape(n2)).reshape(n, n)
        K = (eriK @ D.reshape(n2)).reshape(n, n)
        F = H + J - 0.5 * K
        E = 0.5 * np.sum(D * (H + F))
        err = F @ D @ S - S @ D @ F
        errs.append(err.ravel())
        focks.append(F.copy())
        if len(errs) > 8:
            errs.pop(0)
            focks.pop(0)
        m = len(errs)
        if m > 1:
            B = -np.ones((m + 1, m + 1))
            B[m, m] = 0.0
            for a in range(m):
                for b in range(m):
                    B[a, b] = errs[a] @ errs[b]
            rhs = np.zeros(m + 1)
            rhs[m] = -1.0
            try:
                c = np.linalg.solve(B, rhs)[:m]
                F = sum(ci * Fi for ci, Fi in zip(c, focks))
            except np.linalg.LinAlgError:
                pass
        eps, C = diag_fock(F)
        D = 2.0 * C[:, :nocc] @ C[:, :nocc].T
        if abs(E - e_old) < tol and it > 2:
            return E, C, eps, it, True
        e_old = E
    return E, C, eps, max_iter, False


def mp2(eri, C, eps, nocc):
    """Closed-shell MP2 from dense chemist AO ERIs: (ia|jb) transform
    via four quarter GEMMs + the spin-summed pair energy."""
    n = eri.shape[0]
    Co, Cv = C[:, :nocc], C[:, nocc:]
    nv = n - nocc
    x = np.tensordot(Co, eri, (0, 0))       # (o, nu, la, si)
    x = np.tensordot(x, Cv, ((1,), (0,)))   # (o, la, si, a)
    x = np.tensordot(x, Co, ((1,), (0,)))   # (o, si, a, j)
    ovov = np.tensordot(x, Cv, ((1,), (0,)))  # (i, a, j, b)
    e_o, e_v = eps[:nocc], eps[nocc:]
    denom = (
        e_o[:, None, None, None]
        - e_v[None, :, None, None]
        + e_o[None, None, :, None]
        - e_v[None, None, None, :]
    )
    t = ovov / denom
    return float(np.sum(t * (2.0 * ovov - ovov.transpose(0, 3, 2, 1))))


def run(fixture: Path) -> dict:
    t0 = time.perf_counter()
    S = read_dat_matrix(fixture / "s.dat")
    n = S.shape[0]
    H = read_dat_matrix(fixture / "t.dat", n) + read_dat_matrix(
        fixture / "v.dat", n
    )
    natoms, charges, coords = read_geometry(fixture / "geom.dat")
    nel = int(round(charges.sum()))
    nocc = nel // 2
    e_nuc = nuclear_repulsion(charges, coords)
    packed = np.load(fixture / "eri.npy", mmap_mode="r")
    eri = unpack_dense(packed, n)
    e_elec, C, eps, it, conv = rhf(S, H, eri, nocc)
    e_mp2 = mp2(eri, C, eps, nocc)
    return {
        "oracle": "host-numpy-f64 (tools/host_oracle.py)",
        "nbasis": n,
        "nel": nel,
        "e_nuc": e_nuc,
        "e_hf_total": e_elec + e_nuc,
        "e_mp2_corr": e_mp2,
        "scf_iterations": it,
        "scf_converged": bool(conv),
        "wall_s": round(time.perf_counter() - t0, 1),
    }


def main():
    for d in sys.argv[1:]:
        fixture = Path(d)
        res = run(fixture)
        out = fixture / "oracle.json"
        out.write_text(json.dumps(res, indent=1) + "\n")
        print(json.dumps({"fixture": str(fixture), **res}))


if __name__ == "__main__":
    main()
