"""Column-function library (vectorized, JVM-side) for reference scalar ops."""

from .columns import (  # noqa: F401
    chinese_number_to_long,
    clean_tag,
    content_type_col,
    label_value_pairs,
    normalize_ocr_col,
    rename_with_mapping,
)
