from petasearch_spark.plans.search import search, search_multi_target

__all__ = ["search", "search_multi_target"]
