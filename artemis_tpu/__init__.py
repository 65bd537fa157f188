"""artemis_tpu — a TPU-native (JAX/XLA/Pallas) multifluid radiation
hydrodynamics framework with the capabilities of lanl/artemis.

The compute path is pure JAX over ghost-padded global arrays (sharded over a
``jax.sharding.Mesh`` for multi-chip runs); see SURVEY.md for the mapping
from the reference's Parthenon/Kokkos architecture.
"""

__version__ = "0.1.0"

from .config import ParameterInput  # noqa: F401
from .simulation import Simulation  # noqa: F401
