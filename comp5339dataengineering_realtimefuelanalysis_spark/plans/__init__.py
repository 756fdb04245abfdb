from .registry import REGISTRY, QueryDef, load_table

__all__ = ["REGISTRY", "QueryDef", "load_table"]
