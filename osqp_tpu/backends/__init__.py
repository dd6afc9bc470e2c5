"""Algebra backend implementations (see :mod:`osqp_tpu.algebra`).

Every backend module exposes:

* ``NAME``            - backend name string
* ``capabilities()``  - capability bitmask (:class:`CapabilitiesType`)
* ``Solver``          - class with the low-level solver surface mirroring the
  reference binding (reference src/bindings.cpp.in:107-323):
  ``setup / solve / warm_start / update_data_vec / update_data_mat /
  update_settings / update_rho / adjoint_derivative_*``.
"""
