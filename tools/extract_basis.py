"""Extract the exact basis-set parameters from committed fixture matrices.

Strategy (fast, separable — see tools/fit_basis.py for the slow general
fit):
  1. free (single-primitive) exponents: 1-D root finds on free x free
     cross-center overlap entries;
  2. contracted coefficients: for shell I, the row S_ref[I, :] is linear
     in I's (normalised) coefficient vector, so alternating linear
     least-squares over shells converges in a few sweeps;
  3. tight exponents are taken from the published tables and *verified*
     by the final S/T residual (kinetic entries weight them heavily).

Usage: python tools/extract_basis.py <fixture_dir> <basis_name>
Prints a basis_data.py-ready table and the final residuals.
"""

import sys
from pathlib import Path

import numpy as np
from scipy.optimize import brentq

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from afesp_tpu.integrals import basis_data
from afesp_tpu.integrals.engine import (
    Shell,
    _prim_norm,
    _shell_pair_1e,
    build_basis,
    c2s_matrix,
    kinetic,
    overlap,
)
from afesp_tpu.io import dat


def pair_S(shell_a: Shell, shell_b: Shell) -> np.ndarray:
    Ta, Tb = c2s_matrix(shell_a.l), c2s_matrix(shell_b.l)
    return Ta @ _shell_pair_1e(shell_a, shell_b, kind="S") @ Tb.T


def norm_shell(l, exps, coefs, center):
    import math

    exps = np.asarray(exps, float)
    coefs = np.asarray(coefs, float) * np.array([_prim_norm(e, l) for e in exps])
    ee = exps[:, None] + exps[None, :]
    from afesp_tpu.integrals.engine import _double_fact

    s = (
        np.pi**1.5
        * _double_fact(2 * l - 1)
        / 2.0**l
        * np.sum(coefs[:, None] * coefs[None, :] / ee ** (l + 1.5))
    )
    return Shell(l, np.asarray(center, float), exps, coefs / math.sqrt(s))


def extract(fixture, basis_name):
    fixture = Path(fixture)
    natoms, charges, coords = dat.read_geometry(fixture / "geom.dat")
    S_ref = dat.read_dat_matrix(fixture / "s.dat")
    T_ref = dat.read_dat_matrix(fixture / "t.dat")

    data = {e: [list(s) for s in sh] for e, sh in basis_data.BASIS_SETS[basis_name.lower()].items()}
    elements = [basis_data.ELEMENTS[int(z)] for z in charges]

    # function offsets under the assumed shell structure
    shell_info = []  # (atom_idx, elem, shell_idx, l, off)
    off = 0
    for ai, elem in enumerate(elements):
        for si, (l, prims) in enumerate(data[elem]):
            shell_info.append((ai, elem, si, l, off))
            off += 2 * l + 1
    nbf = off
    assert nbf == S_ref.shape[0], (nbf, S_ref.shape)

    # ---- step 1: free exponents ------------------------------------------
    # reference partner: a free s-shell on a *different* atom (prefer the
    # smallest-l free shell available); bootstrap with a same-l
    # two-unknown solve for s-s first.
    free = [
        (ai, elem, si, l, off)
        for (ai, elem, si, l, off) in shell_info
        if len(data[elem][si][1]) == 1
    ]

    # bootstrap: find two free s shells on different atoms
    s_free = [f for f in free if f[3] == 0]
    # solve all (elem, shell) free exponents; identical (elem, si) on
    # several atoms share the value.
    solved = {}

    # choose a reference free-s pair on different atoms
    fa = s_free[0]
    fb = next(f for f in s_free if f[0] != fa[0] and (f[1], f[2]) != (fa[1], fa[2]))
    if (fb[1], fb[2]) == (fa[1], fa[2]):
        raise RuntimeError("need distinct free s shells")
    R2 = float(np.sum((coords[fa[0]] - coords[fb[0]]) ** 2))
    sref = S_ref[fa[4], fb[4]]
    tref = T_ref[fa[4], fb[4]]

    def st(a, b):
        p = a + b
        q = a * b / p
        S = (2 * np.sqrt(a * b) / p) ** 1.5 * np.exp(-q * R2)
        return S, q * (3 - 2 * q * R2) * S

    from scipy.optimize import fsolve

    a0 = data[fa[1]][fa[2]][1][0][0]
    b0 = data[fb[1]][fb[2]][1][0][0]
    (ea, eb), info, ier, msg = fsolve(
        lambda x: np.array(st(x[0], x[1])) - [sref, tref], [a0, b0], full_output=True
    )
    solved[(fa[1], fa[2])] = ea
    solved[(fb[1], fb[2])] = eb
    print(f"bootstrap: {fa[1]} shell {fa[2]} = {ea:.9f}; {fb[1]} shell {fb[2]} = {eb:.9f}")

    # remaining free shells vs a solved free s on another atom
    ref_s = {(fa[1], fa[2]): fa, (fb[1], fb[2]): fb}
    for f in free:
        key = (f[1], f[2])
        if key in solved:
            continue
        ai, elem, si, l, offi = f
        partner = fa if fa[0] != ai else fb
        pexp = solved[(partner[1], partner[2])]
        pshell = norm_shell(0, [pexp], [1.0], coords[partner[0]])
        target = S_ref[offi, partner[4]]  # m=0 component row

        def res(x):
            sh = norm_shell(l, [x], [1.0], coords[ai])
            return pair_S(sh, pshell)[0, 0] - target

        x0 = data[elem][si][1][0][0]
        lo, hi = x0 / 10, x0 * 10
        try:
            sol = brentq(res, lo, hi, xtol=1e-13)
        except ValueError:
            # fall back to secant around x0
            from scipy.optimize import newton

            sol = newton(res, x0, tol=1e-13)
        solved[key] = sol
        print(f"{elem} shell {si} (l={l}) exponent = {sol:.9f}")

    # install solved free exponents (and share them into general tails)
    for (elem, si), e in solved.items():
        l, prims = data[elem][si]
        data[elem][si] = (l, [(e, 1.0)])

    # ---- step 2: alternating linear solves for contracted shells ---------
    def build(datadict):
        saved = dict(basis_data.BASIS_SETS)
        basis_data.BASIS_SETS[basis_name.lower()] = {
            e: [tuple(s) for s in datadict[e]] for e in datadict
        }
        try:
            return build_basis(charges, coords, basis_name)
        finally:
            basis_data.BASIS_SETS.update(saved)

    contracted = [
        (elem, si)
        for elem in set(elements)
        for si, (l, prims) in enumerate(data[elem])
        if len(prims) > 1
    ]
    # candidate primitive set per contracted shell: published exponents +
    # free same-l exponents of the element
    cand = {}
    for elem, si in contracted:
        l, prims = data[elem][si]
        exps = [e for e, _ in prims]
        for sj, (l2, p2) in enumerate(data[elem]):
            if l2 == l and len(p2) == 1 and p2[0][0] not in exps:
                exps.append(p2[0][0])
        cand[(elem, si)] = exps

    for sweep in range(8):
        worst = 0.0
        for elem, si in contracted:
            l, prims = data[elem][si]
            exps = cand[(elem, si)]
            # rows: the first atom of this element, m=0 component
            ai = elements.index(elem)
            offi = next(
                o for (a, e, s, l2, o) in shell_info if a == ai and s == si
            )
            # build design matrix: overlap of each (normalised) primitive
            # with every basis function (m=0 row component)
            basis = build(data)
            cols = []
            prim_rows = []
            for e in exps:
                psh = norm_shell(l, [e], [1.0], coords[ai])
                row = np.zeros(nbf)
                for (aj, elj, sj, lj, offj) in shell_info:
                    blk = pair_S(psh, basis.shells[[k for k,(a2,e2,s2,l3,o2) in enumerate(shell_info) if (a2,s2)==(aj,sj)][0]])
                    row[offj : offj + blk.shape[1]] = blk[0]
                prim_rows.append(row)
            A = np.array(prim_rows)  # (nprim, nbf)
            y = S_ref[offi]
            # drop columns belonging to the shell itself (diag handled by
            # normalisation) — keep them, they're informative too; but the
            # diagonal entry is exactly 1 by construction for the true c.
            c, *_ = np.linalg.lstsq(A.T, y, rcond=None)
            resid = np.abs(A.T @ c - y).max()
            worst = max(worst, resid)
            data[elem][si] = (l, list(zip(exps, c)))
        print(f"sweep {sweep}: worst row residual {worst:.3e}")
        if worst < 1e-11:
            break

    # ---- verify ----------------------------------------------------------
    basis = build(data)
    S = overlap(basis)
    T = kinetic(basis)
    print("final S maxerr:", np.abs(S - S_ref).max())
    print("final T maxerr:", np.abs(T - T_ref).max())

    for elem in sorted(set(elements)):
        print(f'    "{elem}": [')
        for l, prims in data[elem]:
            print(f"        ({l}, [")
            for e, c in prims:
                print(f"            ({e:.10g}, {c:.12g}),")
            print("        ]),")
        print("    ],")
    return data


if __name__ == "__main__":
    extract(sys.argv[1], sys.argv[2])
