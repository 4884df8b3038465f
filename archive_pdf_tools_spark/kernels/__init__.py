"""Pure-NumPy kernels re-deriving the reference's per-page math.

No Spark / no third-party imports beyond NumPy.  Each module documents the
reference semantics it reproduces (citations are ``file:line`` into
``/root/reference``) and any deliberate deviations.
"""
