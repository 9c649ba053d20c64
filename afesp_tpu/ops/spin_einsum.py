"""Spin-block-sparse einsum for spin-orbital tensors in BLOCK spin layout.

Every tensor in the spin-orbital CC algebra conserves Sz blockwise
(ops/spin.py builds the ERI slices that way, and the CC iterates inherit
it exactly — forbidden blocks are *exact* zeros, since every contribution
to them contains an exactly-zero factor):

  * 2-index (t1, F):    block (s0, s1) nonzero iff s0 == s1
  * 4-index (v, t2, W): block (s0, s1, s2, s3) nonzero iff s0+s1 == s2+s3

`spin_blocked_einsum` enumerates the spin assignments of all indices in
an einsum spec, drops every assignment that hits a zero block of any
operand, contracts the surviving (half-sized) blocks, and reassembles the
output.  For the typical two-operand o^3 v^3 contraction this issues 10
GEMMs each 1/64 the dense size — a 6.4x FLOP cut on the f64-emulating
MXU, exact up to reassociation.  This is the TPU-native counterpart of
the reference's manual spin handling (its Fortran loops never multiply
the zero blocks either, ccsd.f90:106-148 decision tree).
"""

from __future__ import annotations

import itertools
from functools import partial

import jax.numpy as jnp


def _rule(sigmas: tuple[int, ...]) -> bool:
    if len(sigmas) == 2:
        return sigmas[0] == sigmas[1]
    if len(sigmas) == 4:
        return sigmas[0] + sigmas[1] == sigmas[2] + sigmas[3]
    raise ValueError(f"no spin rule for a {len(sigmas)}-index tensor")


def spin_blocked_einsum(spec: str, *ops):
    """einsum over block-spin-layout operands, skipping zero spin blocks.

    All operands must be 2- or 4-index tensors obeying the Sz rule above,
    with every axis of even length (alpha half then beta half).
    """
    ins, out = spec.replace(" ", "").split("->")
    in_specs = ins.split(",")
    letters = sorted(set("".join(in_specs) + out))

    # full extent of each index letter
    dims: dict[str, int] = {}
    for op, sp in zip(ops, in_specs):
        for ax, c in enumerate(sp):
            dims[c] = op.shape[ax]

    def half(c: str, s: int) -> slice:
        h = dims[c] // 2
        return slice(0, h) if s == 0 else slice(h, dims[c])

    pieces: dict[tuple[int, ...], list] = {}
    for assign in itertools.product((0, 1), repeat=len(letters)):
        s = dict(zip(letters, assign))
        if not all(_rule(tuple(s[c] for c in sp)) for sp in in_specs):
            continue
        sliced = [
            op[tuple(half(c, s[c]) for c in sp)] for op, sp in zip(ops, in_specs)
        ]
        key = tuple(s[c] for c in out)
        pieces.setdefault(key, []).append(
            jnp.einsum(spec, *sliced, optimize=True)
        )

    dtype = jnp.result_type(*ops)
    block_shape = tuple(dims[c] // 2 for c in out)

    def assemble(prefix: tuple[int, ...]):
        if len(prefix) == len(out):
            ps = pieces.get(prefix)
            if ps is None:
                return jnp.zeros(block_shape, dtype)
            return sum(ps[1:], ps[0])
        axis = len(prefix)
        return jnp.concatenate(
            [assemble(prefix + (0,)), assemble(prefix + (1,))], axis=axis
        )

    return assemble(())
