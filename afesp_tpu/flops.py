"""Analytic FLOP accounting for the MXU-utilization metric (SURVEY.md §7
stage 7).  Counts are 2x the multiply-accumulate counts of every
contraction in the production programs, in *algorithmic f64 FLOPs* —
i.e. what the math requires, not the (larger) number of f32 MXU passes
XLA's f64 emulation issues.  MFU reported against the bf16 MXU peak is
therefore a conservative lower bound.
"""

from __future__ import annotations

# Peak dense-matmul throughput of one TPU v5e chip: 197 TFLOP/s bf16
# (public spec).  MEASURED on this part (8192^3 / 4096^3 GEMMs, on-device
# scalar forcing so the 32 MB/s tunnel readback cannot pollute the
# timing):
#   bf16  119 TFLOP/s      (60% of spec peak at 8k^3)
#   f32   103 TFLOP/s      (default XLA precision)
#   f64   1.9 TFLOP/s      (XLA double-double emulation — NO MXU f64 path)
# and at the CCSD-iteration GEMM shape (M = o^2 = 100, K = N = 2809):
#   f64   0.30 TFLOP/s     (M=100 fills <1 MXU tile of rows)
# This is why the ">50% MXU utilization" target is physically unreachable
# for f64-contracted CC at any size: the f64 ceiling itself is ~1% of the
# bf16 peak.  The package's answer is the hybrid paths (split-f32 vvvv,
# f32 triples panels, the Pallas finale), which move the dominant FLOPs
# onto the native f32 path while keeping the 1e-8 Ha contract.
PEAK_BF16 = 197e12
MEASURED_BF16 = 119e12
MEASURED_F32 = 103e12
MEASURED_F64 = 1.9e12


def sz_fraction(spec: str) -> float:
    """Fraction of a dense contraction's MACs that survive Sz-block
    sparsity (ops/spin_einsum.py): enumerate the 2^letters spin
    assignments, keep those where every operand block is allowed
    (2-index: equal spins; 4-index: s0+s1 == s2+s3); each surviving
    assignment costs (1/2)^letters of the dense MACs."""
    ins = spec.split("->")[0].split(",")
    letters = sorted(set("".join(ins)))
    ok = 0
    for bits in range(2 ** len(letters)):
        s = {c: (bits >> i) & 1 for i, c in enumerate(letters)}
        good = True
        for sp in ins:
            sig = [s[c] for c in sp]
            if len(sig) == 2 and sig[0] != sig[1]:
                good = False
            if len(sig) == 4 and sig[0] + sig[1] != sig[2] + sig[3]:
                good = False
        ok += good
    return ok / 2 ** len(letters)


def spinorb_ccsd_iteration_flops(o: int, v: int, precision: str = "f64") -> float:
    """One spin-orbital CCSD iteration (ccsd_spinorb_iteration +
    fused DIIS), in FLOPs *as executed*: contractions evaluated
    Sz-block-sparse carry their surviving-block fraction (sz_fraction),
    so the TFLOP/s bench numbers reflect work actually issued, not the
    dense-algorithm count.

    precision="hybrid" counts each contraction at its executed cost:
    every matmul with an ERI operand runs as dense integer-digit bf16
    MXU GEMMs = digit_pairs(5, 6) = 15 pair products over the DENSE
    operands (no Sz blocking; exact_gemm at L=5/maxdeg=6), so the
    reported TFLOP/s is honest for the mode the headline bench runs
    (was hard-coded 10 — the round-4 advisor's pair-count finding
    applied here too)."""
    hybrid = precision in ("hybrid", "pallas", "fused")
    p = float(digit_pairs(5, 6))
    # `h`: digit-GEMM contractions — 15 bf16 digit-pair products over
    # dense operands in hybrid, Sz-blocked fraction of the MACs in f64.
    h = (lambda spec: p) if hybrid else sz_fraction
    f = h  # the F intermediates took the digit route too
    # terms evaluated DENSE in f64 mode (plain es) but digit in hybrid
    d = (lambda spec: p) if hybrid else (lambda spec: 1.0)
    mac = 0.0
    # F intermediates
    mac += f("mf,mafe->ae") * v * v * o * v
    mac += f("mnaf,mnfe->ae") * v * v * o * o * v
    mac += f("ne,nmie->mi") * o * o * o * v
    mac += f("mnef,inef->mi") * o * o * o * v * v
    mac += o * v * o * v            # nf,mnef->me (dense)
    # W intermediates
    mac += d("mnie,je->mnij") * o**4 * v
    mac += h("mnef,ijef->mnij") * o**4 * v * v
    mac += h("mbef,jf->mbej") * o * o * v**3
    mac += d("nb,nmej->mbej") * o**3 * v * v
    mac += h("mnef,jnfb->mbej") * o**3 * v**3  # w4
    # T1
    mac += o * v * v + o * o * v + 2 * (o * v) ** 2
    mac += f("mife,mafe->ia") * o * o * v**3
    mac += d("mnea,mnei->ia") * o**3 * v * v
    # T2
    mac += o**3 * v * v             # ie,ma,mbej chain (dense)
    mac += h("miea,mbej->ijab") * o**3 * v**3
    mac += h("ijae,be->ijab") * o * o * v**3
    mac += o * o * v**3             # ijae,mb,me (dense)
    mac += o**3 * v * v             # ie,me,mjab
    mac += d("ijbm,ma->ijab") * o**3 * v * v
    mac += h("ie,ejab->ijab") * o * o * v**3
    mac += o**3 * v * v             # mi,mjab
    mac += h("mnij,mnab->ijab") * o**4 * v * v
    # blocked tau*vvvv: 3 spin-block GEMMs; x15 digit pairs in hybrid
    mac += (3 * p if hybrid else 3) * o * o * (v // 2) ** 4
    mac += h("ijef,maef->ijma") * o**3 * v**3  # G
    mac += 2 * o**3 * v * v         # G*t1 (two terms)
    mac += o * o * v * v            # energy reduction
    # DIIS gram matrix: nerr^2 * size ~ 64 * (ov + o^2 v^2)
    mac += 64 * (o * v + o * o * v * v)
    return 2.0 * mac


def spinorb_triples_flops(o: int, v: int, strict: bool = False) -> float:
    """Spin-orbital (T): six contraction GEMMs + three t1 outer products
    per (i,j,k) panel + the P(a/bc)/denominator/energy elementwise
    finale.

    strict=False: the algorithmic full-cube count (o^3 panels) — what
    the reference's loop nest executes (ccsd.f90:1868-1914) and the
    basis of the headline TFLOP/s "effective throughput" number.

    strict=True: FLOPs as executed by the production strict-triangle
    path (C(o,3) panels, 6/36 weight — see strict_triple_list): the
    honest numerator for MXU-utilization metrics."""
    ntrip = o * (o - 1) * (o - 2) // 6 if strict else o**3
    gemm_mac = ntrip * (3 * v**4 + 3 * o * v**3)  # f-sums (K=v) + m-sums (K=o)
    outer = 3 * ntrip * v**3        # disconnected t3d
    elementwise = 10 * ntrip * v**3  # P(a/bc) x2, D, product, reduction
    return 2.0 * gemm_mac + 2.0 * outer + elementwise


def ao_to_mo_flops(n: int) -> float:
    return 2.0 * 4 * n**5


def digit_pairs(L: int, maxdeg: int = 7) -> int:
    """bf16 MXU passes per exact_gemm contraction: digit pairs (i, j)
    with i, j < L and (i+1)+(j+1) <= maxdeg (ops/exact_gemm.py).
    L=6/maxdeg=7 -> 21, L=5 -> 19, L=4 -> 15."""
    return sum(
        1 for i in range(L) for j in range(L) if i + j + 2 <= maxdeg
    )


def spatial_ccsd_iteration_flops(o: int, v: int) -> float:
    """One spatial (Piecuch) CCSD iteration as EXECUTED on the large-tier
    digit-GEMM path, dominant contractions only (a lower bound on issued
    MXU work — small o^2v^2-scale terms and elementwise tails are
    dropped).  Each contraction is weighted by ITS digit-pair GEMM count
    — ccsd_spatial._DIG_L runs the O(o v^3)-scale v_vvov matricisation
    sites at L=5/L=4 (fewer pairs) while the heavyweights hold
    L=6/maxdeg=7 = 21 bf16 pair GEMMs (ops/exact_gemm.py), each a real
    MXU pass — so utilization vs MEASURED_BF16 is the honest dashboard
    number (round-4 advisor finding: a single global pairs=21 overstated
    issued work at the mixed-L sites)."""
    p6, p5, p4 = digit_pairs(6), digit_pairs(5), digit_pairs(4)
    mac = p6 * 1.0 * o * o * v**4    # c_oovv x v_vvvv (ccsd.f90:1669)
    mac += p6 * 6.0 * o**3 * v**3    # I_ovov/I_voov/x_voov family
    # I_vv / vovv' contractions: the L=5 "efia,jkef" + L=4 "efma,mief"
    # v_vvov matricisations (_DIG_L)
    mac += (p5 + p4) * 1.0 * o**2 * v**3
    mac += p6 * 2.0 * o**4 * v * v   # I_oooo + its T2 consumer
    return 2.0 * mac


def spatial_triples_flops(
    o: int, v: int, doing_CR: bool = True, strict: bool = False
) -> float:
    """Spatial triples family: twelve t3_D GEMMs per (i,j,k) panel (six
    K=v f-sums + six K=o m-sums, ccsd.f90:2168-2173), doubled when the
    CR moment M3 is built (2186-2194), plus the z3/y/xbar/denominator
    elementwise finale.  strict=True counts the sorted-triples grid
    (i<=j<=k, ~o^3/6 panels) the fused kernel executes; False counts
    the full cube — the reference loop nest's algorithmic cost.  These
    panels run f32 on the large tiers, so utilization reports against
    MEASURED_F32."""
    ntrip = o * (o + 1) * (o + 2) // 6 if strict else o**3
    gemm_mac = ntrip * (6.0 * v**4 + 6.0 * o * v**3)
    if doing_CR:
        gemm_mac *= 2.0
    elementwise = 20.0 * ntrip * v**3
    return 2.0 * gemm_mac + elementwise
