from .dist import DistributedMatcher  # noqa: F401
from .mesh import DATA_AXIS, make_data_mesh  # noqa: F401
