from .mesh import make_mesh, shard_train_state, env_sharding, replicated  # noqa: F401
from . import distributed  # noqa: F401
