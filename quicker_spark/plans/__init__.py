from quicker_spark.plans.term_query import TermQuery, And, Or, Empty, NewTermQuery

__all__ = ["TermQuery", "And", "Or", "Empty", "NewTermQuery"]
