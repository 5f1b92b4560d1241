"""Scalar column-expression library (reference SURVEY.md §2.3).

Everything here is a pure `pyspark.sql.Column` expression — JVM-side,
inside whole-stage codegen, no Python UDFs. These are the building
blocks the reference implements as per-row pandas/python transforms
(fragment-validator field mapper, redcap data processor, gsid
generator); here they vectorize for free.
"""

from idhub_spark.functions.expressions import (
    boolean_expr,
    control_status_expr,
    extract_year_expr,
    gsid_expr,
    id_validation_expr,
    normalize_name_expr,
    null_normalize_expr,
    registration_year_expr,
    type_coerce,
)

__all__ = [
    "boolean_expr",
    "control_status_expr",
    "extract_year_expr",
    "gsid_expr",
    "id_validation_expr",
    "normalize_name_expr",
    "null_normalize_expr",
    "registration_year_expr",
    "type_coerce",
]
