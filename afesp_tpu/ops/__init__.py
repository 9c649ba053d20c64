from .linalg import Diis, symmetric_orthogonaliser

__all__ = ["Diis", "symmetric_orthogonaliser"]
