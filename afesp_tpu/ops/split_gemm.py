"""Ozaki-split f32 MXU GEMMs for f64-accurate contractions.

TPU MXUs have no f64 path: XLA emulates f64 dots as double-double limb
programs at ~1.9 TFLOP/s peak (0.3 TFLOP/s at CC shapes) with ~4x the
f64 bytes in f32 limb temporaries.  These helpers instead split each f64
operand hi/lo into two f32 halves (48-bit combined mantissa), run the
three significant products (hh, hl, lh) as native-f32 batched GEMMs with
the contraction axis chunked to `kc` so the MXU's f32 accumulators never
sum more than kc terms, and combine the chunks in f64.  Measured
end-to-end on H2O/cc-pVTZ CCSD: converged energy within ~2e-9 Ha of the
all-f64 path, at native-f32 throughput (~103 TFLOP/s measured ceiling vs
1.9 for emulated f64).  Error scales ~linearly with kc.

Consumers: the CCSD hybrid paths (methods/ccsd_spinorb.py,
methods/ccsd_spatial.py), the large-basis device Fock build
(methods/hf.py) and the large-basis AO->MO transform (methods/mp2.py).
"""

from __future__ import annotations

from functools import partial

import jax.numpy as jnp
import numpy as np


def _chunk_A(Tm, kc: int):
    """(M,K) f64 -> hi/lo f32 halves in the (c, M, kc) chunk layout."""
    M, K = Tm.shape
    nc = -(-K // kc)
    pad = nc * kc - K
    if pad:
        Tm = jnp.pad(Tm, ((0, 0), (0, pad)))
    Tc = Tm.reshape(M, nc, kc).transpose(1, 0, 2)
    Ah = Tc.astype(jnp.float32)
    return Ah, (Tc - Ah.astype(jnp.float64)).astype(jnp.float32)


def _chunk_B(Vm, kc: int):
    """(K,N) f64 -> hi/lo f32 halves in the (c, kc, N) chunk layout."""
    K, N = Vm.shape
    nc = -(-K // kc)
    pad = nc * kc - K
    if pad:
        Vm = jnp.pad(Vm, ((0, pad), (0, 0)))
    Vc = Vm.reshape(nc, kc, N)
    Bh = Vc.astype(jnp.float32)
    return Bh, (Vc - Bh.astype(jnp.float64)).astype(jnp.float32)


def split_matmul(Tm=None, Vm=None, kc: int = 64, A_pre=None, B_pre=None):
    """(M,K) @ (K,N) f64 as Ozaki-split f32 MXU GEMMs.

    A_pre/B_pre take already-split (hi, lo) chunk-layout halves for
    operands that are loop constants — converting the O(v^4) ERI slice
    inside the CC while_loop cost ~8 ms/iteration (profiled), so the CC
    solvers hoist those conversions out of the loop (presplit hooks)."""
    Ah, Al = A_pre if A_pre is not None else _chunk_A(Tm, kc)
    Bh, Bl = B_pre if B_pre is not None else _chunk_B(Vm, kc)
    f64 = jnp.float64
    es = partial(jnp.einsum, optimize=True)
    return (
        es("cmk,ckn->cmn", Ah, Bh).astype(f64)
        + es("cmk,ckn->cmn", Ah, Bl).astype(f64)
        + es("cmk,ckn->cmn", Al, Bh).astype(f64)
    ).sum(0)


def split_einsum(sub: str, A, B, kc: int = 64):
    """Two-operand einsum evaluated as an Ozaki-split f32 MXU GEMM
    (split_matmul) instead of an XLA-emulated f64 contraction.

    Supports plain contractions (no batch/repeated indices): the shared
    subscripts are contracted, the free ones appear in the output in the
    order the caller wrote.  Used for the CCSD iteration's O(o^3 v^3)
    terms in hybrid mode, where the f64-emulation throughput (~0.3
    TFLOP/s at these shapes) dominates the iteration wall.
    """
    ins, out = sub.split("->")
    sa, sb = ins.split(",")
    contr = [c for c in sa if c in sb]
    fa = [c for c in sa if c not in contr]
    fb = [c for c in sb if c not in contr]
    assert set(out) == set(fa + fb) and len(set(sa)) == len(sa)
    Ap = jnp.transpose(A, [sa.index(c) for c in fa + contr])
    Bp = jnp.transpose(B, [sb.index(c) for c in contr + fb])
    M = int(np.prod(Ap.shape[: len(fa)], dtype=np.int64))
    K = int(np.prod(Ap.shape[len(fa) :], dtype=np.int64))
    N = int(np.prod(Bp.shape[len(contr) :], dtype=np.int64))
    C = split_matmul(Ap.reshape(M, K), Bp.reshape(K, N), kc)
    C = C.reshape(Ap.shape[: len(fa)] + Bp.shape[len(contr) :])
    return jnp.transpose(C, [(fa + fb).index(c) for c in out])
