"""Solve the fixture basis sets exactly.

Identification (established by exponent extraction from kinetic
diagonals; see tools/extract_channel.py):
  * h2o-cc-pvdz / n2-cc-pvdz / f2-cc-pvdz fixtures actually use the
    Ahlrichs **def2-SVP** basis (O free s 0.2553077/0.8097598, d 1.2,
    H p 0.8 — exact def2-SVP values; the directory names are misnomers);
  * h2o-cc-pvtz uses genuine **cc-pVTZ** (all free exponents match the
    published table exactly).

With the published contracted-shell exponents fixed, every contraction
coefficient vector follows from a *linear* solve against the exact
fixture S/T/V rows (linear in the normalised coefficients).  Row
residuals at ~1e-15 confirm the exponents; the generated module
afesp_tpu/integrals/fixture_basis.py carries the result.

Usage: python tools/solve_fixture_basis.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.extract_basis import norm_shell, pair_S
from tools.extract_channel import pair_T, pair_V
from afesp_tpu.io import dat

ROOT = Path("/root/reference/sample_data")

# (l, kind, candidate_exponents or None for free-from-Tdiag)
DEF2_SVP_STRUCT = {
    "O": [
        (0, "fit", [2266.1767785, 340.87010191, 77.363135167, 21.479644940, 6.6589433124]),
        (0, "free", None),
        (0, "free", None),
        (1, "fit", [17.721504317, 3.8635505440, 1.0480920883]),
        (1, "free", None),
        (2, "free", None),
    ],
    "H": [
        (0, "fit", [13.010701, 1.9622572, 0.44453796]),
        (0, "free", None),
        (1, "free", None),
    ],
}

# n2/f2 fixtures: genuine cc-pVDZ (EMSL) — contracted s1/s2 share the
# 8 tight primitives + the diffuse tail; p1 has 3 tights + tail.
CC_PVDZ_STRUCT = {
    "N": [
        (0, "fit", [9046.0, 1357.0, 309.3, 87.73, 28.56, 9.464, 3.290, 0.9997, 0.2248]),
        (0, "fit", [9046.0, 1357.0, 309.3, 87.73, 28.56, 9.464, 3.290, 0.9997, 0.2248]),
        (0, "free", None),
        (1, "fit", [13.55, 2.917, 0.7973, 0.2185]),
        (1, "free", None),
        (2, "free", None),
    ],
    "F": [
        (0, "fit", [14710.0, 2207.0, 502.8, 142.6, 46.47, 16.70, 6.356, 1.316, 0.3897]),
        (0, "fit", [14710.0, 2207.0, 502.8, 142.6, 46.47, 16.70, 6.356, 1.316, 0.3897]),
        (0, "free", None),
        (1, "fit", [22.67, 4.977, 1.347, 0.3471]),
        (1, "free", None),
        (2, "free", None),
    ],
}

CC_PVTZ_STRUCT = {
    "O": [
        (0, "fit", [15330.0, 2299.0, 522.4, 147.3, 47.55, 16.76, 6.207, 0.6882, 1.752, 0.2384]),
        (0, "fit", [15330.0, 2299.0, 522.4, 147.3, 47.55, 16.76, 6.207, 0.6882, 1.752, 0.2384]),
        (0, "free", None),
        (0, "free", None),
        (1, "fit", [34.46, 7.749, 2.280, 0.7156, 0.2140]),
        (1, "free", None),
        (1, "free", None),
        (2, "free", None),
        (2, "free", None),
        (3, "free", None),
    ],
    "H": [
        (0, "fit", [33.87, 5.095, 1.159, 0.3258, 0.1027]),
        (0, "free", None),
        (0, "free", None),
        (1, "free", None),
        (1, "free", None),
        (2, "free", None),
    ],
}


def solve_fixture(fixture_dir, atom_elems, struct, label):
    natoms, charges, coords = dat.read_geometry(Path(fixture_dir) / "geom.dat")
    S_ref = dat.read_dat_matrix(Path(fixture_dir) / "s.dat")
    T_ref = dat.read_dat_matrix(Path(fixture_dir) / "t.dat")
    V_ref = dat.read_dat_matrix(Path(fixture_dir) / "v.dat")

    shells_meta = []
    off = 0
    for ai, elem in enumerate(atom_elems):
        for si, (l, kind, cand) in enumerate(struct[elem]):
            shells_meta.append((ai, elem, si, l, kind, off))
            off += 2 * l + 1
    assert off == S_ref.shape[0], (off, S_ref.shape)

    params = {}
    # free exponents from kinetic diagonals
    for ai, elem, si, l, kind, o in shells_meta:
        if kind == "free" and (elem, si) not in params:
            alpha = T_ref[o, o] / (l + 1.5)
            params[(elem, si)] = (l, [alpha], [1.0])

    def shell_of(key, ai):
        l, es, cs = params[key]
        return norm_shell(l, es, cs, coords[ai])

    # iterate linear solves until self-consistent (contracted shells feed
    # each other's trusted columns on the second pass)
    fit_keys = []
    for ai, elem, si, l, kind, o in shells_meta:
        if kind == "fit" and (elem, si) not in fit_keys:
            fit_keys.append((elem, si))

    def solve_coeffs(key, cand, include_diag=True):
        """Linear coefficient solve for shell `key` given exponents; returns
        (coefs, residual incl. diag checks)."""
        elem, si = key
        l = struct[elem][si][0]
        m0 = next(m for m in shells_meta if (m[1], m[2]) == key)
        ai_r, row_off = m0[0], m0[5]
        partners = []
        for m2 in shells_meta:
            if (m2[1], m2[2]) == key or (m2[1], m2[2]) not in params:
                continue
            partners.append((m2[0], (m2[1], m2[2]), m2[5], 2 * m2[3] + 1))
        cols = [c for _, _, o2, d2 in partners for c in range(o2, o2 + d2)]
        A = []
        for e in cand:
            psh = norm_shell(l, [e], [1.0], coords[ai_r])
            rs, rt, rv = [], [], []
            for a2, k2, o2, d2 in partners:
                p2 = shell_of(k2, a2)
                rs += list(pair_S(psh, p2)[0])
                rt += list(pair_T(psh, p2)[0])
                rv += list(pair_V(psh, p2, charges, coords)[0])
            A.append(np.concatenate([rs, np.multiply(0.2, rt), np.multiply(0.05, rv)]))
        A = np.array(A)
        y = np.concatenate(
            [S_ref[row_off, cols], 0.2 * T_ref[row_off, cols], 0.05 * V_ref[row_off, cols]]
        )
        if not np.all(np.isfinite(A)):
            z = np.full(len(y), 1e3)
            return np.zeros(len(cand)), 1e3, 1e3, 1e3, z
        try:
            c, *_ = np.linalg.lstsq(A.T, y, rcond=None)
        except np.linalg.LinAlgError:
            z = np.full(len(y), 1e3)
            return np.zeros(len(cand)), 1e3, 1e3, 1e3, z
        rvec = A.T @ c - y
        resid = np.abs(rvec).max()
        saved = params.get(key)
        params[key] = (l, list(cand), list(c))
        sh = shell_of(key, m0[0])
        dT = pair_T(sh, sh)[0, 0] - T_ref[row_off, row_off]
        dV = pair_V(sh, sh, charges, coords)[0, 0] - V_ref[row_off, row_off]
        if saved is not None:
            params[key] = saved
        return c, resid, dT, dV, rvec

    def cross_resid(key_a, key_b):
        """S/T/V entries between two same-element contracted shells."""
        ma = next(m for m in shells_meta if (m[1], m[2]) == key_a)
        mb = next(m for m in shells_meta if (m[1], m[2]) == key_b and m[0] == ma[0])
        sa, sb = shell_of(key_a, ma[0]), shell_of(key_b, mb[0])
        return np.array(
            [
                pair_S(sa, sb)[0, 0] - S_ref[ma[5], mb[5]],
                0.2 * (pair_T(sa, sb)[0, 0] - T_ref[ma[5], mb[5]]),
                0.05 * (pair_V(sa, sb, charges, coords)[0, 0] - V_ref[ma[5], mb[5]]),
            ]
        )

    def channel_resid_full(keys, cand):
        """Residual of a shared-exponent channel: rows + diags + mutuals."""
        parts = []
        for key in keys:
            c, r, dT, dV, rvec = solve_coeffs(key, cand)
            l = struct[key[0]][key[1]][0]
            params[key] = (l, list(cand), list(c))
            parts.append(rvec)
            parts.append(np.array([0.2 * dT, 0.05 * dV]))
        for i in range(len(keys)):
            for j in range(i + 1, len(keys)):
                parts.append(cross_resid(keys[i], keys[j]))
        return np.concatenate(parts)

    from scipy.optimize import least_squares

    # group shells by (element, l) channel with shared candidate exponents
    channels = {}
    for key in fit_keys:
        elem, si = key
        l = struct[elem][si][0]
        channels.setdefault((elem, l), []).append(key)

    worst = None
    for sweep in range(3):
        worst = 0.0
        for (elem, l), keys in channels.items():
            cand = list(params.get(keys[0], (l, struct[elem][keys[0][1]][2], None))[1])
            r = np.abs(channel_resid_full(keys, cand)).max()
            if r > 1e-8:
                frees = {
                    params[(e2, s2)][1][0]
                    for (e2, s2), (l2, es2, cs2) in params.items()
                    if e2 == elem and l2 == l and len(es2) == 1
                }
                fixed = [e for e in cand if any(abs(e - f) < 1e-9 for f in frees)]
                var0 = [e for e in cand if not any(abs(e - f) < 1e-9 for f in frees)]

                def pres(x):
                    es = list(np.exp(np.clip(x, np.log(1e-3), np.log(5e7)))) + fixed
                    return channel_resid_full(keys, es)

                sol = least_squares(
                    pres,
                    np.log(var0),
                    method="lm",
                    xtol=1e-15,
                    ftol=1e-15,
                    max_nfev=3000,
                )
                cand = list(np.exp(sol.x)) + fixed
                r = np.abs(channel_resid_full(keys, cand)).max()
            worst = max(worst, r)
            print(f"  [{label}] {elem} l={l} channel: resid {r:.2e}", flush=True)
        if worst < 1e-9:
            break
    print(f"[{label}] worst residual: {worst:.3e}")
    return params, worst


def main():
    out = {}
    p1, w1 = solve_fixture(
        ROOT / "h2o-cc-pvdz/1.80_104.45", ["O", "H", "H"], DEF2_SVP_STRUCT, "def2-svp h2o"
    )
    # NOTE: the n2/f2 fixtures ship complete integral files already, so
    # their (cc-pVDZ) basis recovery has no deliverable; the N/F core
    # contractions are also rank-deficient against the available
    # cross-center data (see git history for the attempts).
    p4, w4 = solve_fixture(
        ROOT / "h2o-cc-pvtz/2.00_104.45", ["O", "H", "H"], CC_PVTZ_STRUCT, "cc-pvtz h2o"
    )

    def table_of(params, elems):
        out = {}
        for elem in elems:
            shl = sorted([(si, v) for (e, si), v in params.items() if e == elem])
            out[elem] = [(l, list(zip(es, cs))) for si, (l, es, cs) in shl]
        return out

    svp = table_of(p1, ["O", "H"])
    tz = table_of(p4, ["O", "H"])

    path = Path(__file__).resolve().parents[1] / "afesp_tpu/integrals/fixture_basis.py"
    with open(path, "w") as f:
        f.write('"""Auto-generated by tools/solve_fixture_basis.py — basis sets\n')
        f.write("recovered exactly from the committed fixture S/T/V matrices.\n\n")
        f.write("The sample_data 'cc-pvdz' fixtures actually use def2-SVP (Ahlrichs);\n")
        f.write("h2o-cc-pvtz uses genuine cc-pVTZ.  Contraction coefficients are in\n")
        f.write("normalised-function space (build_basis re-normalisation is a no-op).\n")
        f.write(f"Worst fit residuals: def2-svp {w1:.3e}; cc-pvtz {w4:.3e}\n")
        f.write('\"\"\"\n\n')
        for name, table in (
            ("FIXTURE_DEF2_SVP", svp),
            ("FIXTURE_CC_PVTZ", tz),
        ):
            f.write(f"{name} = {{\n")
            for elem, shells in table.items():
                f.write(f'    "{elem}": [\n')
                for l, prims in shells:
                    f.write(f"        ({l}, [\n")
                    for e, c in prims:
                        f.write(f"            ({float(e)!r}, {float(c)!r}),\n")
                    f.write("        ]),\n")
                f.write("    ],\n")
            f.write("}\n\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
