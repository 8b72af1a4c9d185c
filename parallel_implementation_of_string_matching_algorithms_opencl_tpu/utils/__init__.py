from . import config, io  # noqa: F401
