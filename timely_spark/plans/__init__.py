from .request import QueryRequest, SubQuery
from .builder import build_subquery, run_query
from .response import to_query_response

__all__ = ["QueryRequest", "SubQuery", "build_subquery", "run_query", "to_query_response"]
