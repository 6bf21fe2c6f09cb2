from .adapt import build_window_schedule  # noqa: F401
from .nlml import negative_log_marginal_likelihood, optimize_gp_hyperparameters  # noqa: F401
from .nuts import nuts_transition, run_nuts  # noqa: F401
from .solve import MagiError, MagiResult, solve_magi  # noqa: F401
from .target import MagiTarget  # noqa: F401
