from .registry import TABLES, load_table, load_all  # noqa: F401
from .managed import ManagedTable  # noqa: F401
