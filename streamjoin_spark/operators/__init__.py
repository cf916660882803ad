from . import aggs, joins  # noqa: F401
