"""f64-grade GEMM on the int8 MXU path (Ozaki-scheme integer limbs).

TPU MXUs have no f64 unit, and XLA's f64 emulation decomposes each
operand into f32 limb arrays ~8x the f64 bytes (measured: a 116-bf
(n^3, n) @ (n, n) quarter transform compiles to a 22.5 GB program — it
cannot even fit).  The naive hi/lo split-f32 alternative (split_gemm)
runs at native f32 speed but carries an irreducible ~sqrt(K)*2^-24
relative-to-term noise floor from f32 multiply/accumulate rounding —
measured 1.2e-8 Ha on a 25-bf MP2 energy, outside the 1e-8 contract.

This module implements the accurate-AND-fast scheme (Ozaki et al.,
"error-free transformation" matmul family): operands are scaled by
power-of-two row/column scales into [-1/2, 1/2], expanded in base-128
integer digits, and every digit-pair product runs as an int8 x int8 ->
int32 MXU GEMM.  Digit products (<= 2^14) and int32 accumulations
(K <= 2^17) are EXACT; the only error is the dropped high-degree digit
pairs, the f32-cascade digitize seam (~2^-48 of scale, see _digits) and
the final f64 recombination — genuinely f64-grade, at int8-MXU
throughput (measured 76+ TOPS on one v5e through the axon tunnel).

Cost: npairs = maxdeg*(maxdeg-1)/2 int8 GEMMs (28 at the default
maxdeg=8) — each ~4x cheaper than an f32 GEMM pass on v5e hardware.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# base-2^7 digits: |digit| <= 64 fits int8, digit products <= 2^14, and
# int32 accumulation over K products stays exact while K*2^14 < 2^31
_Q = 7
_BASE = float(2**_Q)
_MAX_K = 2**31 // (2 ** (2 * _Q + 2))  # 131072, with 2 bits of slack


def _pow2_scale(x, axis):
    """Per-row/col power-of-two scale s >= max|x| (exact divides).

    Computed by exponent-field manipulation (frexp/ldexp lower to a few
    bitcast/shift ops), NOT ceil(log2(m)): the emulated-f64 `log2`
    expands to a ~1000-instruction polynomial fusion PER CALL SITE on
    this backend, which alone bloated the whole-solve executable to
    77 MB — and server-side program-load time (the dominant per-process
    cold cost through the tunnel) is size-proportional.

    The f64 frexp path is not lowerable here (the X64-rewrite pass has
    no s64 bitcast), so the exponent comes from an f32 frexp and two
    EXACT f64 fixup selects (comparisons between m and powers of two):
    frexp(f32(m)) = (mant, e) with 2^(e-1) <= f32(m) < 2^e, and f32
    rounding-to-nearest cannot take a value below a representable power
    of two it equals or exceeds — so 2^e >= m always, and the true
    ceiling is either 2^e or 2^(e-1); one halving test decides exactly.
    Exponents beyond f32 range ride on exact power-of-two pre/post
    shifts (values below 2^-1000 clamp: a column whose max is that small
    is numerically zero and any valid scale leaves its digits zero).
    """
    m = jnp.max(jnp.abs(x), axis=axis, keepdims=True)
    m = jnp.where(m > 0, m, 1.0)
    if m.dtype == jnp.float64:
        # exact 200-bit shift ladder: brings any f64 magnitude into
        # [2^-74, 2^100] so the f32 frexp sees a normal value; every
        # factor is a power of two, so m * f and s / f are exact
        f = jnp.ones_like(m)
        for t in (100.0, 300.0, 500.0, 700.0, 900.0):
            f = f * jnp.where(m > 2.0**t, 2.0**-200, 1.0)
            f = f * jnp.where(m < 2.0**-t, 2.0**200, 1.0)
        _, e = jnp.frexp((m * f).astype(jnp.float32))
        s = jnp.ldexp(jnp.float32(1.0), e).astype(m.dtype) / f
    else:
        _, e = jnp.frexp(m.astype(jnp.float32))
        s = jnp.ldexp(jnp.float32(1.0), e).astype(m.dtype)
    return jnp.where(0.5 * s >= m, 0.5 * s, s)


def _digits(x, L: int):
    """x in [-1/2, 1/2] -> L base-128 int8 digit arrays (balanced round).

    Extraction runs as an f32 cascade seeded by the hi/lo split of the
    f64 input — NOT an f64 loop: on this backend every emulated-f64 op
    expands to ~30-60 f32 HLO instructions cloned per call site, and
    the digitize loops were a top source of executable bloat (program
    size drives the per-process server-side load wall).  Only 3 f64 ops
    remain (the split); the cascade itself is exact f32 arithmetic:
    y*128, round, subtract are all exact at every step, so the digits
    reproduce the (split) input exactly.

    Accuracy: the one rounding seam is folding the low f32 half into
    the level-3 residual (~2^-48 of scale worst-case, below the L<=6
    truncation floors; at L=7 it caps accuracy at ~2^-48 instead of the
    f64 loop's 2^-50).  The fold can push level-4+ inputs slightly past
    1/2, so digits are bounded by 72, not 64 — products <= 72^2 < 2^14
    and kc=512 chunk sums < 2^24 stay exact in f32 accumulation."""
    f32 = jnp.float32
    is64 = x.dtype == jnp.float64
    xh = x.astype(f32) if is64 else x
    y = xh
    ds = []
    for i in range(L):
        if i == 3 and is64:
            # fold in the low half, scaled to the cascade's level
            xl = (x - xh.astype(x.dtype)).astype(f32)
            y = y + xl * f32(_BASE**3)
        y = y * f32(_BASE)
        d = jnp.round(y)
        y = y - d
        ds.append(d.astype(jnp.int8))
    return ds


def digitize_A(A, L: int = 7):
    """(M,K) f64 -> (digit list, row scale (M,1)) for exact_gemm."""
    s = _pow2_scale(A, axis=1)
    return _digits(A / (2.0 * s), L), s


def digitize_B(B, L: int = 7):
    """(K,N) f64 -> (digit list, col scale (1,N)) for exact_gemm."""
    s = _pow2_scale(B, axis=0)
    return _digits(B / (2.0 * s), L), s


# f32 digit GEMMs accumulate exactly while kc * 2^(2Q) < 2^24; larger K
# is chunked to kc with f64 combination across chunks (still exact)
_MAX_K_F32 = 2**24 // (2 ** (2 * _Q + 1))  # 512, with 1 bit of slack


def _chunk_geometry(K: int):
    kc = min(K, _MAX_K_F32)
    nc = -(-K // kc)
    return kc, nc, nc * kc - K


def prechunk_A(A, L: int = 4):
    """Digitize + chunk an (M,K) lhs ONCE for repeated exact_gemm calls
    with a loop-constant operand (e.g. ERI slices inside the CC
    while_loop): returns (bf16 chunk list, row scale) for A_pre.
    Re-deriving digits in-loop costs ~10 elementwise passes over the
    f64 operand per iteration."""
    Ad, sA = digitize_A(A, L)
    M, K = A.shape
    kc, nc, pad = _chunk_geometry(K)

    def ch(a):
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a.reshape(M, nc, kc).transpose(1, 0, 2).astype(jnp.bfloat16)

    return [ch(a) for a in Ad], sA


def prechunk_op(spec: str, side: str, arr, L: int = 4):
    """Prechunk one side of an exact_einsum contraction: matricise `arr`
    exactly as exact_einsum would for `spec` (side "A" -> (fa+contr)
    rows, side "B" -> (contr+fb) columns) and digitize once.  Feed the
    result to exact_einsum's A_pre/B_pre for loop-constant operands."""
    import numpy as np

    ins, _ = spec.split("->")
    sa, sb = ins.split(",")
    contr = [c for c in sa if c in sb]
    if side == "A":
        fa = [c for c in sa if c not in contr]
        Ap = jnp.transpose(arr, [sa.index(c) for c in fa + contr])
        M = int(np.prod(Ap.shape[: len(fa)], dtype=np.int64))
        return prechunk_A(Ap.reshape(M, -1), L)
    fb = [c for c in sb if c not in contr]
    Bp = jnp.transpose(arr, [sb.index(c) for c in contr + fb])
    K = int(np.prod(Bp.shape[: len(contr)], dtype=np.int64))
    return prechunk_B(Bp.reshape(K, -1), L)


def prechunk_B(B, L: int = 4):
    """(K,N) rhs analogue of prechunk_A; returns B_pre."""
    Bd, sB = digitize_B(B, L)
    K, N = B.shape
    kc, nc, pad = _chunk_geometry(K)

    def ch(b):
        if pad:
            b = jnp.pad(b, ((0, pad), (0, 0)))
        return b.reshape(nc, kc, N).astype(jnp.bfloat16)

    return [ch(b) for b in Bd], sB


def prechunk_B_chunkscaled(B, L: int = 5):
    """(K,N) rhs digitized with PER-K-CHUNK column scales: chunk c of kc
    rows gets its own power-of-two scales s[c] >= max|chunk| per column.

    Two properties the flat prechunk_B lacks:
      - streaming: each chunk digitizes independently (no global column
        max over all K), so a huge operand can be digitized blockwise
        without ever holding a second f64 copy — this is how the
        >=140-bf tier stores v_vvvv as bf16 limbs only (12 GB of f64 +
        transpose transients would blow a 16 GB chip);
      - accuracy: truncation is ~2^-7L of the CHUNK max, not the global
        column max, strictly tighter on operands with wide dynamic range.

    The cross-chunk combine can no longer fold the scale in at the end;
    exact_gemm applies s[c] per chunk before the c-reduction (an extra
    elementwise pass over the (nc,M,N) f32 pair product).

    Returns (chunks, sB): chunks[j] is (nc, kc, N) bf16, sB is (nc, 1, N)
    f64.  kc is the largest divisor of K <= 512 (exact f32 accumulation
    bound); K must have one >= 8 — true for every ERI matricisation this
    feeds (K = nvirt^2 or a multiple of nbasis).
    """
    K, N = B.shape
    kc = max(d for d in range(1, min(K, _MAX_K_F32) + 1) if K % d == 0)
    assert kc >= 8, f"pathological K={K}: no usable divisor <= {_MAX_K_F32}"
    nc = K // kc

    def block(c):
        rows = jax.lax.dynamic_slice(
            B, (c * kc, jnp.int32(0)), (kc, N)
        )
        s = _pow2_scale(rows, axis=0)
        ds = _digits(rows / (2.0 * s), L)
        return [d.astype(jnp.bfloat16) for d in ds], s

    chunks, s = jax.lax.map(block, jnp.arange(nc, dtype=jnp.int32))
    return list(chunks), s


def reconstruct_f32_from_B_pre(B_pre, K: int, N: int):
    """Recombine a prechunk_B_chunkscaled operand back to its f32 value
    (K, N) — used once per run for consumers that want a plain f32 copy
    (e.g. the CR-CC intermediates' single v_vvvv contraction) without
    ever carrying the f64 original."""
    chunks, s = B_pre
    nc, kc, _ = chunks[0].shape
    acc = None
    for j, ch in enumerate(chunks):
        term = ch.astype(jnp.float32) * jnp.float32(2.0 ** (-_Q * (j + 1)))
        acc = term if acc is None else acc + term
    out = acc * (2.0 * s).astype(jnp.float32)
    return out.reshape(K, N)


def gemm_B_pre_streamed(A, B_pre, maxdeg: int = 6):
    """(M,K) @ (K,N) against a prechunk_B_chunkscaled operand, STREAMING
    the K-chunk axis with a lax.fori_loop: peak transient is one (M,N)
    f32 pair-product group + the f64 accumulator, instead of the
    (nc, M, N) pair-product blocks the fused path materialises — 12.8 GB
    for the CR Kronecker GEMM at 174 bf (nc=53, M=o*v, N=v^2), which is
    why the single-chip CR term cannot use exact_gemm directly.  Same
    digit algebra as _exact_gemm_pre (f32 exact within a chunk, f64
    combine across), summation order differs at f64 roundoff."""
    Bc, sB = B_pre
    nc, kc, N = Bc[0].shape
    M, K = A.shape
    Ad, sA = digitize_A(A, len(Bc))
    pad = nc * kc - K

    def ch(a):
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a.reshape(M, nc, kc).transpose(1, 0, 2).astype(jnp.bfloat16)

    Ac = [ch(a) for a in Ad]

    def body(c, acc):
        groups: dict = {}
        for i in range(len(Ac)):
            for j in range(len(Bc)):
                if i + j + 2 > maxdeg:
                    continue
                P = jnp.einsum(
                    "mk,kn->mn", Ac[i][c], Bc[j][c],
                    preferred_element_type=jnp.float32,
                )
                _group_add(groups, i + j + 2, P)
        t = None
        for k in sorted(groups):
            ps = groups[k]
            g = ps[0] if len(ps) == 1 else sum(ps[1:], start=ps[0])
            g = (g * jnp.float32(2.0 ** (-_Q * k[0]))).astype(jnp.float64)
            t = g if t is None else t + g
        return acc + t * sB[c]

    acc = jax.lax.fori_loop(0, nc, body, jnp.zeros((M, N)))
    return acc * (4.0 * sA)


def exact_einsum(sub: str, A, B, L: int = 4, maxdeg: int = 5, A_pre=None,
                 B_pre=None, A_shape=None, B_shape=None):
    """Two-operand einsum via exact_gemm (plain contractions only, same
    contract as split_gemm.split_einsum).  The L=4/maxdeg=5 default (6
    digit-pair GEMMs) carries ~2^-35-of-row/col-scale error — ~500x
    tighter than the hi/lo split-f32 path at ~2x its GEMM passes, and
    ~20x faster than an XLA-emulated f64 contraction of the same shape.

    A_pre/B_pre: prechunk_A/prechunk_B output for a loop-constant
    operand, in the (fa+contr)/(contr+fb) matricised layout this
    function would build — the operand array is then only consulted for
    its SHAPE (pass the original, or None with A_shape/B_shape giving
    the einsum-order shape, so huge operands need not exist at all)."""
    import numpy as np

    ins, out = sub.split("->")
    sa, sb = ins.split(",")
    contr = [c for c in sa if c in sb]
    fa = [c for c in sa if c not in contr]
    fb = [c for c in sb if c not in contr]
    assert set(out) == set(fa + fb) and len(set(sa)) == len(sa)
    a_dims = A.shape if A is not None else A_shape
    b_dims = B.shape if B is not None else B_shape
    ash = tuple(a_dims[sa.index(c)] for c in fa + contr)
    bsh = tuple(b_dims[sb.index(c)] for c in contr + fb)
    M = int(np.prod(ash[: len(fa)], dtype=np.int64))
    K = int(np.prod(ash[len(fa) :], dtype=np.int64))
    N = int(np.prod(bsh[len(contr) :], dtype=np.int64))
    Am = Bm = None
    if A_pre is None:
        Am = jnp.transpose(A, [sa.index(c) for c in fa + contr]).reshape(M, K)
    if B_pre is None:
        Bm = jnp.transpose(B, [sb.index(c) for c in contr + fb]).reshape(K, N)
    C = exact_gemm(Am, Bm, A_pre=A_pre, B_pre=B_pre, L=L, maxdeg=maxdeg)
    C = C.reshape(ash[: len(fa)] + bsh[len(contr) :])
    return jnp.transpose(C, [(fa + fb).index(c) for c in out])


def exact_gemm(A=None, B=None, *, A_dig=None, B_dig=None, A_pre=None,
               B_pre=None, L: int = 7, maxdeg: int = 8,
               digit_dtype=jnp.float32):
    """(M,K) @ (K,N) f64 to ~2^-49 of the row x col scale.

    A_dig/B_dig take pre-digitized (digits, scale) pairs for operands
    that are loop constants (e.g. the Fock build's ERI matricisations:
    7 int8 limbs cost 7 bytes/element vs 8 for the f64 original).
    maxdeg keeps digit pairs with (i+1)+(j+1) <= maxdeg; 8 -> 28 GEMMs,
    residual ~K * 2^-49 * scale worst-case, ~sqrt(K) * 2^-52 random.

    A_pre/B_pre take prechunk_A/prechunk_B outputs (bf16 chunk lists)
    for loop-constant operands — skips both digitization and chunking.

    digit_dtype picks the MXU pipe.  float32 (default): integer-valued
    bf16 digit GEMMs (base-128 digits are bf16-exact), exact per kc=512
    chunk (products <= 2^14, chunk sums < 2^24 in the f32 accumulator)
    with exact f64 combination across chunks — measured 1.3 s for the
    full 116-bf AO->MO transform.  int8: s32-accumulated int8 MXU
    GEMMs, no chunking (exact for K <= 131072) — compiles and
    validates, but XLA's int8 lowering widens operands to u32 copies at
    runtime (measured seconds per 13k x 13k GEMV — avoid until the
    int8 path lowers natively).
    """
    if A_pre is not None or B_pre is not None:
        assert digit_dtype == jnp.float32
        return _exact_gemm_pre(A, B, A_pre, B_pre, maxdeg)
    Ad, sA = A_dig if A_dig is not None else digitize_A(A, L)
    Bd, sB = B_dig if B_dig is not None else digitize_B(B, L)
    K = Ad[0].shape[1]
    assert K == Bd[0].shape[0]
    if digit_dtype == jnp.int8:
        assert K <= _MAX_K, (
            f"contraction dim {K} exceeds exact-int32 accumulation bound {_MAX_K}"
        )
        dn = (((1,), (0,)), ((), ()))
        acc = None
        for i in range(len(Ad)):
            for j in range(len(Bd)):
                if i + j + 2 > maxdeg:
                    continue
                P = jax.lax.dot_general(
                    Ad[i], Bd[j], dn, preferred_element_type=jnp.int32
                )
                term = P.astype(jnp.float64) * (2.0 ** (-_Q * (i + j + 2)))
                acc = term if acc is None else acc + term
        return acc * (4.0 * sA * sB)

    # bf16 digit path, kc-chunked for exact accumulation at any K.
    # Base-128 digits are INTEGERS in [-64, 64] — exactly representable
    # in bfloat16 (8-bit mantissa holds integers to 256) — so each
    # digit-pair product runs as ONE native bf16 MXU pass (~6x fewer
    # passes than an f32 GEMM at XLA's highest precision) with the f32
    # accumulator keeping every chunk partial exact: products <= 2^14,
    # chunk sums <= kc * 2^14 = 2^23 < 2^24.
    M = Ad[0].shape[0]
    N = Bd[0].shape[1]
    kc = min(K, _MAX_K_F32)
    nc = -(-K // kc)
    pad = nc * kc - K

    def chunk_a(a):
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad)))
        return a.reshape(M, nc, kc).transpose(1, 0, 2).astype(jnp.bfloat16)

    def chunk_b(b):
        if pad:
            b = jnp.pad(b, ((0, pad), (0, 0)))
        return b.reshape(nc, kc, N).astype(jnp.bfloat16)

    Bc = [chunk_b(b) for b in Bd]
    groups: dict = {}
    for i in range(len(Ad)):
        ai = chunk_a(Ad[i])
        for j in range(len(Bd)):
            if i + j + 2 > maxdeg:
                continue
            P = jnp.einsum(  # exact per chunk (f32 accumulation)
                "cmk,ckn->cmn", ai, Bc[j], preferred_element_type=jnp.float32
            )
            _group_add(groups, i + j + 2, P)
    return _recombine(groups, None) * (4.0 * sA * sB)


def _exact_gemm_pre(A, B, A_pre, B_pre, maxdeg: int):
    """bf16 digit-GEMM path with one or both operands prechunked.

    A prechunk_B_chunkscaled operand carries per-chunk scales sB of
    shape (nc, 1, N) (vs the flat (1, N)); the scale is then applied to
    each chunk's pair product before the cross-chunk reduction, which
    remains exact (f32 accumulations within a chunk, f64 across)."""
    if A_pre is not None:
        Ac, sA = A_pre
        nc, _, kc = Ac[0].shape
    if B_pre is not None:
        Bc, sB = B_pre
        nc, kc, _ = Bc[0].shape
    sB_chunked = B_pre is not None and sB.ndim == 3
    pad = None
    if A_pre is None:
        Ad, sA = digitize_A(A, len(Bc))
        M, K = A.shape
        pad = nc * kc - K

        def ch(a):
            if pad:
                a = jnp.pad(a, ((0, 0), (0, pad)))
            return a.reshape(M, nc, kc).transpose(1, 0, 2).astype(jnp.bfloat16)

        Ac = [ch(a) for a in Ad]
    if B_pre is None:
        Bd, sB = digitize_B(B, len(Ac))
        K, N = B.shape
        pad = nc * kc - K

        def ch(b):
            if pad:
                b = jnp.pad(b, ((0, pad), (0, 0)))
            return b.reshape(nc, kc, N).astype(jnp.bfloat16)

        Bc = [ch(b) for b in Bd]
    groups: dict = {}
    for i in range(len(Ac)):
        for j in range(len(Bc)):
            if i + j + 2 > maxdeg:
                continue
            P = jnp.einsum(
                "cmk,ckn->cmn", Ac[i], Bc[j], preferred_element_type=jnp.float32
            )
            _group_add(groups, i + j + 2, P)
    acc = _recombine(groups, sB if sB_chunked else None)
    # non-chunked: keep the exact expression of the direct path so the
    # prechunked routes stay BITWISE identical to it (asserted in tests)
    return acc * (4.0 * sA) if sB_chunked else acc * (4.0 * sA * sB)


def _group_add(groups: dict, d: int, P):
    """Collect a degree-d pair product.  Groups hold LISTS (summed
    lazily inside _recombine's fused reduction); at most 6 per slot so
    the f32 group sum stays exact: 6 addends of <= kc * 72^2 = 2.65e6
    magnitude stay under the 2^24 f32 integer-exactness bound (the 7th
    same-degree pair, maxdeg=8, spills to a second slot)."""
    n = 0
    while (d, n) in groups and len(groups[(d, n)]) >= 6:
        n += 1
    groups.setdefault((d, n), []).append(P)


def _recombine(groups: dict, sB_chunks):
    """Fold degree-grouped f32 pair products into one f64 reduction.

    groups: (degree d, slot) -> (nc, M, N) f32 sum of the degree-d pair
    GEMMs (integer-valued; same-degree f32 adds are exact — <= 6 pairs
    of <= kc * 72^2 magnitude stays under 2^24).  Each group is scaled
    by its 2^-7d weight in f32 (power-of-two, exact), the groups are
    stacked, and ONE convert-multiply-sum runs in emulated f64 — the
    previous per-pair f64 convert/scale/sum/accumulate chains were
    ~6-21x more emulated-f64 ops per call site, the dominant source of
    both executable bloat and per-iteration fusion-dispatch overhead.
    sB_chunks: per-K-chunk column scales (nc, 1, N) to apply before the
    chunk reduction (prechunk_B_chunkscaled operands), or None.

    No concatenation and no materialised partial sums: per group the
    exact f32 pair-sum, the f32 weight-scale, the f64 convert and the
    chunk reduction are written as one expression so XLA fuses them
    into a single multi-input pass over that group's pair-GEMM outputs
    (both a concat-then-reduce variant and eagerly accumulated group
    partials materialised extra ~100 MB-scale f32 intermediates at
    vvvv-sized call sites — measured +5 ms/CCSD iteration)."""
    acc = None
    for k in sorted(groups):
        ps = groups[k]
        g = ps[0] if len(ps) == 1 else sum(ps[1:], start=ps[0])
        g = g * jnp.float32(2.0 ** (-_Q * k[0]))
        if sB_chunks is not None:
            t = (g.astype(jnp.float64) * sB_chunks).sum(0)
        else:
            t = g.astype(jnp.float64).sum(0)
        acc = t if acc is None else acc + t
    return acc
