"""NumPy oracle: independent straight-line implementations of the reference math.

These are deliberately written in the reference's per-cell / per-pulse loop
style (clarity over speed) and serve as the verification target for the
vectorized JAX ops.  Citations point into /root/reference.
"""
