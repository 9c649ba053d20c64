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


def spinorb_ccsd_iteration_flops(o: int, v: int) -> float:
    """One spin-orbital CCSD iteration (ccsd_spinorb_iteration +
    fused DIIS), in f64 FLOPs."""
    mac = 0
    # F intermediates
    mac += v * v * o * v            # mf,mafe->ae
    mac += v * v * o * o * v        # mnaf,mnfe->ae
    mac += o * o * o * v            # ne,nmie->mi
    mac += o * o * o * v * v        # mnef,inef->mi
    mac += o * v * o * v            # nf,mnef->me
    # W intermediates
    mac += o**4 * v                 # mnie,je->mnij
    mac += o**4 * v * v             # mnef,ijef->mnij
    mac += o * o * v**3             # mbef,jf->mbej
    mac += o**3 * v * v             # nb,nmej->mbej
    mac += o**3 * v**3              # mnef,jnfb->mbej
    # T1
    mac += o * v * v + o * o * v + 2 * (o * v) ** 2
    mac += o * o * v**3             # mife,mafe
    mac += o**3 * v * v             # mnea,mnei
    # T2
    mac += 2 * o**3 * v**3          # (ie,ma,mbej) + (miea,mbej)
    mac += 2 * o * o * v**3         # ijae,be ; ijae,mb,me
    mac += 2 * o**3 * v * v         # ie,me,mjab ; ijbm,ma
    mac += o * o * v**3             # ie,ejab
    mac += o**3 * v * v             # mi,mjab
    mac += o**4 * v * v             # mnij,mnab (tau * W_oooo)
    mac += 3 * o * o * (v // 2) ** 4  # blocked tau*vvvv (3 spin-block GEMMs)
    mac += o**3 * v**3              # ijef,maef->ijma (G)
    mac += 2 * o**3 * v * v         # G*t1 (two terms)
    mac += o * o * v * v            # energy reduction
    # DIIS gram matrix: nerr^2 * size ~ 64 * (ov + o^2 v^2)
    mac += 64 * (o * v + o * o * v * v)
    return 2.0 * mac


def spinorb_triples_flops(o: int, v: int) -> float:
    """Full spin-orbital (T): six v-contraction GEMMs + three t1 outer
    products per (i,j,k) panel + the P(a/bc)/denominator/energy
    elementwise finale, in algorithmic FLOPs."""
    gemm_mac = 6 * o**3 * v**4      # f-/m-sum contractions
    outer = 3 * o**3 * v**3         # disconnected t3d
    elementwise = 10 * o**3 * v**3  # P(a/bc) x2, D, product, reduction
    return 2.0 * gemm_mac + 2.0 * outer + elementwise


def ao_to_mo_flops(n: int) -> float:
    return 2.0 * 4 * n**5
