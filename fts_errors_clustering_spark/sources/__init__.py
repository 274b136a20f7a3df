from .readers import TABLES, table  # noqa: F401
