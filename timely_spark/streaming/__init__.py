from .summarize import summarization_query, summarize_batch
from .subscription import SubscriptionManager

__all__ = ["summarization_query", "summarize_batch", "SubscriptionManager"]
