from .schemas import F1_SCHEMAS, COMPOUND_COLORS  # noqa: F401
from .session_facade import F1Session  # noqa: F401
from .analytics import (  # noqa: F401
    avg_lap_time_by_driver_compound,
    qualifying_classification,
)
