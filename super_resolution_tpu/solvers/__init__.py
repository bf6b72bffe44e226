from super_resolution_tpu.solvers.map_solver import (  # noqa: F401
    IRLSMapSolverOptions,
    MapSolverOptions,
)
from super_resolution_tpu.solvers.irls import IRLSMapSolver  # noqa: F401
from super_resolution_tpu.solvers.admm import (  # noqa: F401
    AdmmSolver,
    AdmmSolverOptions,
)
from super_resolution_tpu.solvers.least_squares import (  # noqa: F401
    MinimizeResult,
    minimize,
)
from super_resolution_tpu.solvers.objective import (  # noqa: F401
    data_term_cost,
    data_term_cost_and_grad,
    finite_difference_grad,
    make_map_value_and_grad,
)
