"""Tiled (nvirt>128-capable) spatial triples tier: interpret-mode
correctness of the a-panel twisted-product decomposition vs the f64
full-grid slab path, on random data at a v that is NOT a lane multiple
and spans multiple panels."""

import numpy as np
import pytest


def _problem(o, v, seed=11):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    r = lambda *s: rng.standard_normal(s) * 0.02
    # t2 and v_oovv must carry the physical pair-exchange symmetry
    # X[i,j,a,b] = X[j,i,b,a]: the sorted-triple orbit identity for the
    # z3/y sums relies on it (physical amplitudes/ERIs always have it;
    # the t3_D/m3 cubes are jointly symmetrised by construction and
    # don't care)
    sym = lambda x: jnp.asarray((x + x.transpose(1, 0, 3, 2)) / 2)
    e = np.sort(rng.standard_normal(o + v))
    e[o:] += 4.0
    return (
        jnp.asarray(r(o, v)), sym(r(o, o, v, v)),      # t1, t2
        jnp.asarray(r(v, v, o, v)), jnp.asarray(r(o, o, v, o)),
        sym(r(o, o, v, v)),                            # vvov, oovo, oovv
        jnp.asarray(e[:o]), jnp.asarray(e[o:]),
        jnp.asarray(r(v, o, v, v)), jnp.asarray(r(o, o, o, v)),  # Iv, Jo
    )


@pytest.mark.parametrize("o,v", [(4, 19), (3, 8)])
def test_tiled_matches_f64_full_grid(o, v):
    """Six sums vs _triples_total_spatial (full i,j,k grid, f64): the
    sorted-triple M-operator identity + the slab twisted-product
    decomposition must reproduce the full-cube totals."""
    import jax.numpy as jnp

    from afesp_tpu.methods.triples_spatial import (
        _SUM_KEYS,
        _triples_total_spatial,
        strict_spatial_plan,
    )
    from afesp_tpu.ops.triples_tiled import triples_tiled_spatial

    args = _problem(o, v)
    ref = _triples_total_spatial(
        *args, nocc=o, jlen=1, doing_T=True, doing_R=True, doing_CR=True,
        precision="f64",
    )
    si, sj, sk, w = strict_spatial_plan(o)
    r = triples_tiled_spatial(
        *args, jnp.asarray(si), jnp.asarray(sj), jnp.asarray(sk),
        jnp.asarray(w),
        nocc=o, doing_T=True, doing_R=True, doing_CR=True, B=8, PA=16,
    )
    got = (r[0], r[0] + r[1], r[2], r[2] + r[3], r[4], r[4] + r[5])
    for k, a, b in zip(_SUM_KEYS, ref, got):
        assert abs(float(a) - float(b)) < 5e-6 * max(1.0, abs(float(a))), (
            k, float(a), float(b)
        )


def test_tiled_partial_flags():
    """Disabled variants return zeros and the enabled ones are
    unchanged (the kernel compiles per flag combination)."""
    import jax.numpy as jnp

    from afesp_tpu.methods.triples_spatial import strict_spatial_plan
    from afesp_tpu.ops.triples_tiled import triples_tiled_spatial

    o, v = 3, 10
    args = _problem(o, v, seed=5)
    si, sj, sk, w = strict_spatial_plan(o)
    plan = (jnp.asarray(si), jnp.asarray(sj), jnp.asarray(sk), jnp.asarray(w))
    full = triples_tiled_spatial(
        *args, *plan, nocc=o, doing_T=True, doing_R=True, doing_CR=True,
        B=8, PA=8,
    )
    t_only = triples_tiled_spatial(
        *args, *plan, nocc=o, doing_T=True, doing_R=False, doing_CR=False,
        B=8, PA=8,
    )
    assert abs(float(t_only[0]) - float(full[0])) < 1e-8
    assert abs(float(t_only[1]) - float(full[1])) < 1e-8
    assert float(t_only[2]) == 0.0 and float(t_only[4]) == 0.0
