"""Source/sink layer: Delta Lake protocol, parquet/csv/json registration,
URL scheme routing (the reference's own code surface — SURVEY.md §2.1)."""

from .delta import DeltaTable, read_delta, write_delta  # noqa: F401
from .registry import register_delta, register_parquet, register_csv, register_json, resolve_url  # noqa: F401
