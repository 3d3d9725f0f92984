from .catalog import QUERIES, QuerySpec, register

__all__ = ["QUERIES", "QuerySpec", "register"]
