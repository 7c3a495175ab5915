from blueetl_spark.functions.qdsl import compile_query, is_subfilter, q

__all__ = ["compile_query", "is_subfilter", "q"]
