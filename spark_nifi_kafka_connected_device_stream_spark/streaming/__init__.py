from .pipeline import (
    PRODUCT_VIEW_SCHEMA,
    explode_event_array,
    parse_product_views,
    stamp_processing_time,
    windowed_source_counts,
)

__all__ = [
    "PRODUCT_VIEW_SCHEMA",
    "explode_event_array",
    "parse_product_views",
    "stamp_processing_time",
    "windowed_source_counts",
]
