from .corpus import CORPUS, oracle_sql_map, query_map

__all__ = ["CORPUS", "query_map", "oracle_sql_map"]
