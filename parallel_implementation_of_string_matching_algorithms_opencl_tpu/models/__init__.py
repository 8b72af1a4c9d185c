from . import algorithms  # noqa: F401  (registers the four matchers)
from .base import Matcher, MatchResult  # noqa: F401
from .multi import RabinKarpMultiMatcher  # noqa: F401
from .registry import available_algorithms, get_matcher, register_matcher  # noqa: F401
