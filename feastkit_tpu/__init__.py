"""feastkit_tpu — a TPU-native (JAX/XLA/Pallas) FEAST contour-integration
eigensolver framework with the capabilities of FeastKit.jl.

Finds all eigenpairs of standard / generalized / complex-symmetric /
polynomial problems ``A x = lam B x`` inside a real interval or a complex
elliptical region, over dense, sparse, banded and matrix-free operators.

Architecture (see SURVEY.md for the reference analysis):
  core/        types, the 64-slot fpm parameter contract, contour generation
               (Gauss / trapezoid / derived Zolotarev), numeric tools
  kernel/      pure-functional FEAST iteration cores (lax.while_loop over
               batched contour solves) + explicit step-function RCI parity API
  ops/         Pallas/XLA kernels (batched LU, banded solves, GMRES, ...)
  solvers/     storage-specific drivers: dense, sparse, banded, matrix-free
  parallel/    shard_map contour/RHS parallelism over device meshes (the
               threads/Distributed/MPI replacement)
  interfaces/  high-level API + FEAST-compatible s/d/c/z-prefixed aliases
"""

from .core.types import (Contour, FeastError, FeastGeneralResult, FeastRCIJob,
                         FeastResult)
from .core.parameters import (FEAST_UNINITIALIZED, FeastConfig,
                              FeastParameters, feast_tolerance, feastdefault,
                              feastinit, feastinit_driver)
from .core.contour import (feast_contour, feast_contour_custom_weights,
                           feast_contour_expert, feast_customcontour,
                           feast_gcontour, feast_grational, feast_grationalx,
                           feast_inside_contour, feast_inside_gcontour,
                           feast_rational, feast_rationalx,
                           zolotarev_quadrature)
from .core.tools import feast_name, seeded_subspace
from .solvers.dense import feast_heev, feast_hegv, feast_syev, feast_sygv
from .solvers.banded import (feast_gbev, feast_gbgv, feast_hbev,
                             feast_hbgv, feast_sbev, feast_sbev_complex,
                             feast_sbgv, feast_sbgv_complex)
from .ops.banded import banded_to_full, full_to_banded
from .solvers.sparse import (feast_gcsrev, feast_gcsrgv, feast_hcsrev,
                             feast_hcsrgv, feast_scsrev, feast_scsrev_complex,
                             feast_scsrgv, feast_scsrgv_complex)
from .solvers.sparse import feast_gcsrpev, feast_hcsrpev, feast_scsrpev
from .utils.checkpoint import (FeastCheckpoint, load_checkpoint,
                               resume_kwargs, save_checkpoint)
from .utils.profiling import (FeastTimer, feast_benchmark,
                              feast_parallel_comparison, phase_timer,
                              trace_to)
from .solvers.matfree import (LinearOperator, MatrixVecFunction,
                              create_iterative_solver, feast_matvec,
                              feast_matvec_general)
from .solvers.dense_general import (feast_geev, feast_geev_complex_sym,
                                    feast_gegv, feast_gegv_complex_sym,
                                    feast_pep, feast_pep_direct)
from .core.aux import (check_complex_symmetric, feast_cauchy_weights,
                       feast_clear_all_contours, feast_clear_custom_contour,
                       feast_estimate_count, feast_get_custom_contour,
                       feast_info, feast_inside_contourx,
                       feast_memory_estimate, feast_set_custom_contour,
                       feast_trace_eigenvalues, validate_contour,
                       with_custom_contour)
from .core.backend import (determine_parallel_backend,
                           feast_parallel_capabilities, feast_parallel_info,
                           select_parallel_backend)
from .interfaces.feast import (eigen_feast, eigvals_feast, feast,
                               feast_banded, feast_custom_contour,
                               feast_general, feast_polynomial,
                               feast_set_defaults, feast_summary,
                               feast_validate_interval)

from .parallel.pfeast import (contour_mesh, contour_model_mesh,
                              contour_rhs_mesh, pfeast_dense, pfeast_general,
                              pfeast_sparse, pfeast_sparse_general)
from .interfaces import aliases as _aliases
from .interfaces.aliases import *  # noqa: F401,F403 - s/d/c/z-prefixed FEAST names
from .kernel.rci import (FeastGRCI, FeastHRCI, FeastPolyRCI, FeastPRCI,
                         FeastSRCI)
from .interfaces.compat import *  # noqa: F401,F403 - reference export parity
from .deprecations import (Feast_ERROR_EMID_R, Feast_ERROR_EMIN_EMAX,
                           Feast_ERROR_INTERNAL, Feast_ERROR_M0,
                           Feast_ERROR_MEMORY, Feast_ERROR_N,
                           Feast_ERROR_NO_CONVERGENCE,
                           Feast_ERROR_PROBLEM_SIZE, Feast_RCI_DONE,
                           Feast_RCI_FACTORIZE, Feast_RCI_FACTORIZE_TRANSPOSE,
                           Feast_RCI_INIT, Feast_RCI_MULT_A, Feast_RCI_MULT_B,
                           Feast_RCI_SOLVE, Feast_RCI_SOLVE_TRANSPOSE,
                           Feast_SUCCESS)

__version__ = "0.1.0"

