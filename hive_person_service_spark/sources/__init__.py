from .loader import TABLES, load_table, load_tables, register_views
from .schemas import SCHEMAS

__all__ = ["SCHEMAS", "TABLES", "load_table", "load_tables", "register_views"]
