from .engine import BasisSet, build_basis, eri_tensor, kinetic, nuclear, overlap

__all__ = [
    "BasisSet",
    "build_basis",
    "overlap",
    "kinetic",
    "nuclear",
    "eri_tensor",
]
