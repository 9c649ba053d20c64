"""Generate cc-pVTZ water-trimer integrals (174 basis functions) with the
native McMurchie-Davidson engine — the beyond-reference scaling workload
(the reference's packed store caps near 99 bf, integrals.f90:10-21; this
fixture exercises the spatial nvirt>128 tier: nocc=15, nvirt=159).

Unlike make_dimer.py this writes the ERI as the BINARY native fixture
format `eri.npy` (the packed 8-fold store in the reference's eri_ind
order) instead of eri.dat text: at 174 bf the text file would be ~3 GB
and cost ~30 min to format plus minutes to parse back on this one-core
host, for zero benefit — nothing at this size interoperates with els.x
anyway (it cannot hold >99 bf).  io/dat.read_integrals consumes eri.npy
directly.

Geometry: near-equilibrium cyclic water trimer (each water donates one
H-bond around the O-O-O ring, free hydrogens alternating above/below the
ring plane), coordinates in bohr.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from afesp_tpu.integrals.engine import build_basis, eri_tensor  # noqa: E402
from afesp_tpu.integrals.generate import write_dat_files  # noqa: E402
from afesp_tpu.ops.packed_eri import pack_eri  # noqa: E402

OUT = Path(__file__).resolve().parent.parent / "data" / "h2o-trimer-cc-pvtz"

# bohr; cyclic C1 trimer, O-O ~ 5.32 bohr (~2.82 A).  Ring in the xy
# plane, each O donates to the next; free H's up, up, down.
_RING_R = 5.32 / (2.0 * np.sin(np.pi / 3.0))  # circumradius, O-O side 5.32
_OH = 1.81  # bohr
CHARGES = [8.0, 1.0, 1.0, 8.0, 1.0, 1.0, 8.0, 1.0, 1.0]


def _trimer_coords() -> np.ndarray:
    coords = []
    r_ring = _RING_R
    ups = [1.0, 1.0, -1.0]
    for m in range(3):
        th = 2.0 * np.pi * m / 3.0
        o = np.array([r_ring * np.cos(th), r_ring * np.sin(th), 0.0])
        # donated H: points toward the next oxygen in the ring
        thn = 2.0 * np.pi * ((m + 1) % 3) / 3.0
        on = np.array([r_ring * np.cos(thn), r_ring * np.sin(thn), 0.0])
        u = (on - o) / np.linalg.norm(on - o)
        hd = o + _OH * u
        # free H: out of plane, tilted away from the ring centre
        out = o / np.linalg.norm(o)
        hf = o + _OH * (0.40 * out + ups[m] * 0.917 * np.array([0, 0, 1.0]))
        coords += [o, hd, hf]
    return np.array(coords)


ELS_IN = """! Trimer scaling fixture: spatial CR family at nvirt=159 (>128 —
! exercises the chunked fallback tier past the fused-kernel cliff).
! SCF tolerances tightened as in the dimer fixture (path-independence
! at the 1e-8 contract).
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
    t0 = time.perf_counter()
    coords = _trimer_coords()
    # s/t/v/geom are tiny text files — reuse the .dat writer for them,
    # skipping the quartic eri.dat text by passing write_eri=False
    basis = write_dat_files(OUT, CHARGES, coords, "cc-pvtz", verbose=True,
                            write_eri=False)
    print(f"one-electron files done ({basis.nbf} bf), starting ERI...",
          flush=True)
    eri = eri_tensor(basis, verbose=True)
    np.save(OUT / "eri.npy", pack_eri(eri))
    (OUT / "els.in").write_text(ELS_IN)
    print(f"wrote {OUT} ({basis.nbf} bf) in {time.perf_counter() - t0:.0f}s")


if __name__ == "__main__":
    main()
