"""tomofastx_tpu — a TPU-native 3-D potential-field (gravity + magnetics) joint
inversion framework.

A ground-up JAX/XLA/Pallas rebuild with the capabilities of Tomofast-x v2.0
(reference: Fortran 2008 + MPI). The compute path is dense/blocked linear
algebra on the MXU, batched lifting-wavelet transforms, and matrix-free
constraint operators; multi-chip scaling uses `jax.sharding.Mesh` + shard_map
with XLA collectives instead of explicit MPI.

Subpackages
-----------
- ``config``    : Parfile-compatible configuration (reference: parameters_init.f90)
- ``models``    : grid / model / survey-data containers and forward families
- ``ops``       : numerical kernels (prism integrals, wavelets, LSQR, Pallas)
- ``inversion`` : constraint operators, joint inversion, workflow orchestration
- ``parallel``  : device mesh and sharding helpers
- ``io``        : readers/writers for the reference's ASCII/VTK/binary formats
- ``utils``     : costs, logging, misc
"""

__version__ = "0.1.0"

from tomofastx_tpu.config.parfile import read_parfile, Config  # noqa: F401
