"""Device compute: MSC representation, complex vector kernels, subspace
index maps, and the matrix-free Pauli-string matvec engine."""
