from .asof import asof_join  # noqa: F401
from .interval import interval_join  # noqa: F401
from .ranking import rank1_per_group, topk_per_group  # noqa: F401
from .grid import ordered_group_position  # noqa: F401
