from .catalog import TABLES, load, register_views  # noqa: F401
from .layout import write_clustered, zorder_key  # noqa: F401
from .jsonl import DOCUMENTS_JSONL_SCHEMA, read_jsonl, write_jsonl  # noqa: F401
