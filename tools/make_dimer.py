"""Generate cc-pVTZ water-dimer integrals (116 basis functions) with the
native McMurchie-Davidson engine — the >=100-bf scaling workload.

Geometry: the Smith/Swanton-style near-equilibrium water dimer (donor +
acceptor, O-O ~ 2.97 A), coordinates in bohr.  Writes s/t/v.dat, the ERI
as binary packed eri.npy (5x smaller, 40x faster to read than text —
pass --dat for a reference-format eri.dat instead), geom.dat and an
els.in (CRCCSD(T)_spatial) into data/h2o-dimer-cc-pvtz/ so the large
benchmark (bench_large.py) and the driver can run it like any reference
fixture.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from afesp_tpu.integrals.generate import write_dat_files  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "data" / "h2o-dimer-cc-pvtz"

# bohr; donor water H-bonded to acceptor water along x
CHARGES = [8.0, 1.0, 1.0, 8.0, 1.0, 1.0]
COORDS = np.array(
    [
        [-2.806, 0.000, 0.000],
        [-3.750, 1.440, 0.586],
        [-3.750, -1.440, 0.586],
        [2.806, 0.093, 0.000],
        [1.012, 0.000, 0.000],
        [3.411, -0.764, 1.428],
    ]
)

# els.in mirrors the committed data/h2o-dimer-cc-pvtz/els.in: do NOT
# regenerate with looser SCF tolerances — 1e-9/1e-8 pins the stationary
# point so energies are path-independent at the 1e-8 contract (see the
# comment block in the committed file).
ELS_IN = """! SCF tolerances tightened (r2): with dE ~1e-6-scale steps near
! convergence, a 1e-6 stop leaves the converged energy determined only
! to ~1e-7 — different (equally correct) Fock arithmetic paths then
! legitimately stop one iteration apart.  1e-9/1e-8 pins the stationary
! point so energies are path-independent at the 1e-8 contract.
&elsinput
calc_type="CRCCSD(T)_spatial",
scf_e_tol=1e-9,
scf_d_tol=1e-8,
scf_diis_n_errmat=6,
ccsd_e_tol=1e-6,
ccsd_t_tol=1e-7,
ccsd_diis_n_errmat=8,
scf_maxiter = 150,
ccsd_maxiter = 200,
ccsd_precision = "hybrid",
write_fcidump = .false.,
scf_read_guess = .false.,
scf_write_guess = .false.,
/
"""


def main():
    # default: binary eri.npy (the packed native fixture format — minutes
    # faster to generate/parse than the 481 MB text table, and nothing at
    # 116 bf interoperates with els.x anyway); pass --dat for the text
    # quadruple file.
    as_dat = "--dat" in sys.argv[1:]
    t0 = time.perf_counter()
    basis = write_dat_files(
        OUT, CHARGES, COORDS, "cc-pvtz", verbose=True, write_eri=as_dat
    )
    if not as_dat:
        from afesp_tpu.integrals.engine import eri_tensor
        from afesp_tpu.ops.packed_eri import pack_eri

        eri = eri_tensor(basis, verbose=True)
        np.save(OUT / "eri.npy", pack_eri(eri))
    (OUT / "els.in").write_text(ELS_IN)
    print(f"wrote {OUT} ({basis.nbf} bf) in {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()
