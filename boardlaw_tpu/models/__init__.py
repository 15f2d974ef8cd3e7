from . import heads  # noqa: F401
from .networks import FCModel  # noqa: F401
