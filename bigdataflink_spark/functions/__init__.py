from bigdataflink_spark.functions.cleanse import (
    clean_text,
    coalesce_first,
    concat_name,
    date_parts,
    default_zero,
    from_json_map,
    parse_date_multi,
    to_json_row,
    to_float_safe,
    to_int_safe,
)

__all__ = [
    "clean_text",
    "coalesce_first",
    "concat_name",
    "date_parts",
    "default_zero",
    "from_json_map",
    "parse_date_multi",
    "to_json_row",
    "to_float_safe",
    "to_int_safe",
]
