"""Pure kernels: no Ray, no I/O.  numpy-vectorized primaries plus
Python-int scalar twins (cross-checked against each other in tests)."""
