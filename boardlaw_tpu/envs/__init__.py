from .base import Transition, Empty, Discrete, Masked, Vector, Tensor  # noqa: F401
from . import hex  # noqa: F401
