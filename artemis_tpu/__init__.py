"""artemis_tpu — a TPU-native (JAX/XLA/Pallas) multifluid radiation
hydrodynamics framework with the capabilities of lanl/artemis.

The compute path is pure JAX over ghost-padded global arrays (sharded over a
``jax.sharding.Mesh`` for multi-chip runs); see SURVEY.md for the mapping
from the reference's Parthenon/Kokkos architecture.
"""

__version__ = "0.1.0"

# Persistent compilation cache, configured via jax.config (NOT env
# vars: the axon PJRT plugin pre-imports jax from a site .pth hook, so
# JAX_* env vars set inside a script arrive too late to be read).  The
# min-compile-time threshold must be 0 — the axon backend offloads
# compilation to a remote helper and jax's locally measured compile
# time is ~0s even for kernels that take minutes of wall clock, so any
# positive threshold silently disables the cache.  ARTEMIS_JAX_CACHE=0
# opts out; JAX_COMPILATION_CACHE_DIR (if exported before python
# starts) or the repo-local .jax_cache/ (survives /tmp wipes) is used.
import os as _os

if _os.environ.get("ARTEMIS_JAX_CACHE", "1") != "0":
    import jax as _jax

    if _jax.config.jax_compilation_cache_dir is None:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or _os.path.join(_os.path.dirname(_os.path.dirname(
                _os.path.abspath(__file__))), ".jax_cache"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from .config import ParameterInput  # noqa: F401
from .simulation import Simulation  # noqa: F401
