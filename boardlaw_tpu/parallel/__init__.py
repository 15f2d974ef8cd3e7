from .mesh import make_mesh, shard_train_state, env_sharding, replicated  # noqa: F401
