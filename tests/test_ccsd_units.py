"""Unit tests: the production einsum CCSD program vs the literal
transcription of the reference's debug-twin routines (ccsd.f90:1314-1536),
on random (physically symmetric) tensors."""

import numpy as np
import jax.numpy as jnp

from oracle_ccsd import amplitudes_debug, intermediates_debug
from afesp_tpu.methods.ccsd_spatial import Slices, _intermediates, ccsd_iteration


def _random_problem(seed=0, no=3, nv=5):
    rng = np.random.default_rng(seed)
    n = no + nv
    eri = rng.standard_normal((n, n, n, n)) * 0.1
    eri = eri + eri.transpose(1, 0, 2, 3)
    eri = eri + eri.transpose(0, 1, 3, 2)
    eri = eri + eri.transpose(2, 3, 0, 1)
    phys = eri.transpose(0, 2, 1, 3)
    o, v = slice(0, no), slice(no, n)
    slices = dict(
        v_oovv=phys[o, o, v, v],
        v_ovov=phys[o, v, o, v],
        v_vvov=phys[v, v, o, v],
        v_oovo=phys[o, o, v, o],
        v_oooo=phys[o, o, o, o],
        v_vvvv=phys[v, v, v, v],
    )
    t1 = rng.standard_normal((no, nv)) * 0.05
    t2 = rng.standard_normal((no, no, nv, nv)) * 0.05
    t2 = t2 + t2.transpose(1, 0, 3, 2)
    e = rng.standard_normal(n)
    e[no:] += 3.0
    D_ia = e[:no, None] - e[None, no:]
    D_ijab = (
        e[:no, None, None, None]
        + e[None, :no, None, None]
        - e[None, None, no:, None]
        - e[None, None, None, no:]
    )
    return slices, t1, t2, D_ia, D_ijab


def test_intermediates_match_debug_twin():
    slices, t1, t2, D_ia, D_ijab = _random_problem()
    ref = intermediates_debug(t1, t2, slices)
    mine = _intermediates(
        jnp.asarray(t1), jnp.asarray(t2), Slices(**{k: jnp.asarray(x) for k, x in slices.items()})
    )
    for k, v_ref in ref.items():
        assert np.abs(np.asarray(mine[k]) - v_ref).max() < 1e-13, k


def test_amplitude_update_matches_debug_twin():
    slices, t1, t2, D_ia, D_ijab = _random_problem(seed=3, no=4, nv=6)
    ref_im = intermediates_debug(t1, t2, slices)
    t1_ref, t2_ref = amplitudes_debug(t1, t2, slices, ref_im, D_ia, D_ijab)
    t1_m, t2_m = ccsd_iteration(
        jnp.asarray(t1),
        jnp.asarray(t2),
        Slices(**{k: jnp.asarray(x) for k, x in slices.items()}),
        jnp.asarray(D_ia),
        jnp.asarray(D_ijab),
    )
    assert np.abs(np.asarray(t1_m) - t1_ref).max() < 1e-13
    assert np.abs(np.asarray(t2_m) - t2_ref).max() < 1e-13
    # t2 keeps the ij/ab exchange symmetry
    assert np.abs(t2_ref - t2_ref.transpose(1, 0, 3, 2)).max() < 1e-13
