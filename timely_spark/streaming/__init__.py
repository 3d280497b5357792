from .dedup import streaming_exact_dedup
from .subscription import SubscriptionManager
from .summarize import summarization_query, summarize_batch

__all__ = [
    "streaming_exact_dedup",
    "summarization_query",
    "summarize_batch",
    "SubscriptionManager",
]
