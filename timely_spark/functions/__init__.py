from .time import time_bucket_ms, query_aligned_bucket
from .viz import viz_allows, viz_filter

__all__ = ["time_bucket_ms", "query_aligned_bucket", "viz_allows", "viz_filter"]
