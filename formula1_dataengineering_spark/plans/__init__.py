from .queries import QUERIES  # noqa: F401
from .oracles import ORACLE_SQL  # noqa: F401
