"""Native (C++) runtime components.

``ldl``: sparse LDL' factorization of the quasi-definite KKT system - the
QDLDL-class direct solver used by the numpy backend (with scipy splu
fallback when the native library cannot be built).
"""
