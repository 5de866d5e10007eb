from .scd2 import OP_CREATE, OP_UPDATE, OP_DELETE, OP_FINAL, scd2_versions, immutable_rows
from .bundles import bundle_start_col, boundaries, bundle_filename, expected_bundles
from .pg_csv import (
    bytea_hex,
    pg_array,
    pg_block_range,
    csv_quote,
    csv_header,
    render_entity_csv,
)
from .scd2 import validate_changes
from .bundles import write_bundled_csv

__all__ = [
    "OP_CREATE",
    "OP_UPDATE",
    "OP_DELETE",
    "OP_FINAL",
    "scd2_versions",
    "immutable_rows",
    "bundle_start_col",
    "boundaries",
    "bundle_filename",
    "expected_bundles",
    "bytea_hex",
    "pg_array",
    "pg_block_range",
    "csv_quote",
    "csv_header",
    "render_entity_csv",
    "validate_changes",
    "write_bundled_csv",
]
