from .inspect import broadcast_join_count, explain_str, pushed_filters, scan_columns, shuffle_count

__all__ = [
    "broadcast_join_count",
    "explain_str",
    "pushed_filters",
    "scan_columns",
    "shuffle_count",
]
