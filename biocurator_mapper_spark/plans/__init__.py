from .inspect import exchanges, broadcast_exchanges, pushed_filters, plan_summary

__all__ = ["exchanges", "broadcast_exchanges", "pushed_filters", "plan_summary"]
