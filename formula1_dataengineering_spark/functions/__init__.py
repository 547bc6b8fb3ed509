from .timefmt import format_lap_time  # noqa: F401
from .vectors import cosine_similarity, dot, l2_norm  # noqa: F401
from .text import (  # noqa: F401
    quality_metrics,
    token_count,
    tokens,
    weighted_char_fingerprint,
)
