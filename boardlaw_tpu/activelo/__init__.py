from .solvers import solve, Solution  # noqa: F401
from .suggestions import improvement, suggest  # noqa: F401
