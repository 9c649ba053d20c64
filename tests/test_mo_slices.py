"""Sliced AO->MO transform (methods/mo_slices.py): packed tri-store ->
physicist CCSD slices without ever materialising a dense n^4 tensor.

Oracle: the dense one-shot transform + make_slices (the <=58-bf path,
itself golden-tested against the reference fixtures).
"""

import jax.numpy as jnp
import numpy as np

from afesp_tpu.methods.ccsd_spatial import make_slices
from afesp_tpu.methods.mo_slices import ao_to_mo_slices
from afesp_tpu.methods.mp2 import _ao_to_mo_oneshot
from afesp_tpu.ops.packed_eri import pack_eri


def _symmetric_eri(n: int, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    e = rng.standard_normal((n, n, n, n))
    e = e + e.transpose(1, 0, 2, 3)
    e = e + e.transpose(0, 1, 3, 2)
    e = e + e.transpose(2, 3, 0, 1)
    return e / 8.0


def test_ao_to_mo_slices_matches_dense():
    n, nocc = 12, 4
    eri = _symmetric_eri(n, seed=7)
    rng = np.random.default_rng(8)
    C = rng.standard_normal((n, n)) / np.sqrt(n)

    ref = make_slices(_ao_to_mo_oneshot(jnp.asarray(eri), jnp.asarray(C)), nocc)
    packed = jnp.asarray(pack_eri(eri))
    out, vvvv2 = ao_to_mo_slices(packed, C, n=n, nocc=nocc)
    nv = n - nocc
    out = out._replace(v_vvvv=vvvv2.reshape((nv,) * 4))

    for name in ref._fields:
        r = np.asarray(getattr(ref, name))
        o = np.asarray(getattr(out, name))
        scale = max(np.abs(r).max(), 1.0)
        assert np.abs(o - r).max() < 1e-12 * scale, name


def test_ao_to_mo_slices_awkward_chunking():
    """nvirt prime (chunk loop = nvirt steps of 1) and nocc > nvirt."""
    n, nocc = 10, 3  # nvirt = 7 (prime)
    eri = _symmetric_eri(n, seed=9)
    rng = np.random.default_rng(10)
    C = rng.standard_normal((n, n)) / np.sqrt(n)
    ref = make_slices(_ao_to_mo_oneshot(jnp.asarray(eri), jnp.asarray(C)), nocc)
    out, vvvv2 = ao_to_mo_slices(jnp.asarray(pack_eri(eri)), C, n=n, nocc=nocc)
    out = out._replace(v_vvvv=vvvv2.reshape((n - nocc,) * 4))
    for name in ref._fields:
        r = np.asarray(getattr(ref, name))
        o = np.asarray(getattr(out, name))
        assert np.abs(o - r).max() < 1e-12 * max(np.abs(r).max(), 1.0), name
