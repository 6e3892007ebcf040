"""Math layer.

The reference Math library (src/Math: FastMatrix, CudaMatrix, 56 CUDA
kernels, BLAS wrappers) maps almost entirely onto jax.numpy + XLA fusion
(SURVEY.md §2.2 "TPU mapping"); what remains host-side is file IO for
matrices/vectors and a few host numerics.
"""

from .matrix_io import read_matrix, read_vector, write_matrix, write_vector

__all__ = ["read_matrix", "read_vector", "write_matrix", "write_vector"]
