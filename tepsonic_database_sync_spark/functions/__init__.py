from tepsonic_database_sync_spark.functions.normalize import (
    cents_to_dollars,
    falsy_coalesce,
    fill_unknown,
    norm_name,
    resolve_variant,
    uid_coalesce,
)

__all__ = [
    "cents_to_dollars",
    "falsy_coalesce",
    "fill_unknown",
    "norm_name",
    "resolve_variant",
    "uid_coalesce",
]
