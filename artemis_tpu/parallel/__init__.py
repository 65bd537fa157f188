from .mesh import ShardedDriver, make_device_mesh  # noqa: F401
