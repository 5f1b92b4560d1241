"""Column expressions re-expressing the reference's scalar transforms.

Reference parity (cited into /root/reference):
- null normalization      table-loader/services/data_transformer.py:148-217
- type coercion           table-loader/services/data_transformer.py:148-217
- extract_year            redcap-pipeline/services/data_processor.py:74-78
- boolean transform       redcap-pipeline/services/data_processor.py:79-84
- registration-year       redcap-pipeline/services/data_processor.py:88-167
- control-status parse    redcap-pipeline/services/data_processor.py:169-197
- name normalization      redcap-pipeline/services/center_resolver.py:44-45
- GSID generation         gsid-service/services/gsid_generator.py:15-60
- ID validation           gsid-service/services/id_validator.py:13-111

All are Catalyst expressions (no Python UDFs): they fold into
whole-stage codegen and scale linearly with partitions. At 100 TB the
per-row cost is the same few ns/row as any built-in projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Null sentinels the reference strips everywhere
# (data_transformer.py:156-160, update_detector.py:229-234).
NULL_SENTINELS = ["", "NULL", "null", "NA", "N/A", "nan", "NaN", "None"]

TRUE_VALUES = ["1", "true", "t", "yes", "y"]
FALSE_VALUES = ["0", "false", "f", "no", "n"]


def null_normalize_expr(col: Column) -> Column:
    """'' / NULL / NA / N/A / nan (trimmed) -> real NULL."""
    t = F.trim(col)
    return F.when(t.isin(NULL_SENTINELS), F.lit(None)).otherwise(t)


def type_coerce(col: Column, target: str) -> Column:
    """Schema-aware cast with null normalization first.

    target: one of int/bigint/float/double/boolean/date/timestamp/
    string/decimal(p,s). Booleans accept the reference's lexicons.
    """
    c = null_normalize_expr(col.cast("string"))
    if target in ("boolean", "bool"):
        return boolean_expr(c)
    if target == "date":
        return registration_year_expr(c, normalize_to_jan1=False)
    return c.cast(target)


def extract_year_expr(col: Column) -> Column:
    """'YYYY-MM-DD...' -> int year (data_processor.py:74-78)."""
    return F.substring(F.trim(col.cast("string")), 1, 4).cast("int")


def boolean_expr(col: Column, true_values=None, false_values=None) -> Column:
    """Configured truthy/falsy lexicons -> boolean, else NULL."""
    tv = [v.lower() for v in (true_values or TRUE_VALUES)]
    fv = [v.lower() for v in (false_values or FALSE_VALUES)]
    low = F.lower(F.trim(col.cast("string")))
    return F.when(low.isin(tv), F.lit(True)).when(low.isin(fv), F.lit(False)).otherwise(
        F.lit(None).cast("boolean")
    )


# control-status is the same lexicon parse restricted to truthy-or-false
# (data_processor.py:169-197)
control_status_expr = boolean_expr

def registration_year_expr(col: Column, *, normalize_to_jan1: bool = True) -> Column:
    """Multi-format date parse, validated to 1900-2100, optionally
    normalized to Jan-1 (data_processor.py:88-167).

    Tries the reference's four formats in order, then a bare YYYY.
    `try_to_date`-style semantics via coalesce over strict parses.
    """
    # Shape-dispatch BEFORE parsing: blindly coalescing all four
    # formats costs ~4 exception-driven failed parses per row. The
    # dispatch keys are substring/length probes (not regexes) and the
    # null-sentinel strip is just trim — 'NA'/'NULL'/etc. fail every
    # parse branch and come out NULL anyway. Catalyst's subexpression
    # elimination does not reliably dedupe a repeated trim-cascade
    # across when-branches, so every repeated input here is cheap by
    # construction (measured 10s -> 1.3s at sf0.1 end-to-end).
    # Equivalent to the reference's try-in-order loop because a shape
    # admits only the formats its probe selects.
    s = F.trim(col.cast("string"))
    n = F.length(s)
    parsed = (
        F.when((n == 10) & (F.substring(s, 5, 1) == "-"), F.try_to_date(s, "yyyy-MM-dd"))
        .when(
            (n == 10) & (F.substring(s, 3, 1) == "/"),
            F.coalesce(F.try_to_date(s, "MM/dd/yyyy"), F.try_to_date(s, "dd/MM/yyyy")),
        )
        .when((n == 10) & (F.substring(s, 5, 1) == "/"), F.try_to_date(s, "yyyy/MM/dd"))
        .when(s.rlike(r"^\d{4}$"), F.try_to_date(F.concat(s, F.lit("-01-01"))))
    )
    valid = (F.year(parsed) >= 1900) & (F.year(parsed) <= 2100)
    parsed = F.when(valid, parsed)
    return F.trunc(parsed, "year") if normalize_to_jan1 else parsed


def normalize_name_expr(col: Column) -> Column:
    """lower + trim + '_'->' ' (center_resolver.py:44-45)."""
    return F.lower(F.trim(F.regexp_replace(col, "_", " ")))


# --- ID validation (id_validator.py:13-111) --------------------------------

# error patterns: obviously-bogus identifiers
_ERROR_PATTERNS = [
    r"(?i)^test",
    r"(?i)^demo",
    r"(?i)^sample",
    r"^0+$",
    r"(?i)^x+$",
    r"(?i)^unknown",
    r"(?i)^n/?a$",
]
# warning patterns
_W_SHORT = r"^.{1,2}$"
_W_WHITESPACE = r"\s"
_W_SPECIAL = r"[^A-Za-z0-9_\-\s]"
_W_NUMERIC = r"^\d+$"


def id_validation_expr(col: Column, *, numeric_ok: bool = False) -> Column:
    """struct<valid boolean, severity string, warnings array<string>>.

    Mirrors IDValidator: error patterns -> invalid; warning patterns
    collected; purely-numeric warns unless the identifier type allows.
    """
    s = F.trim(col.cast("string"))
    is_error = F.lit(False)
    for pat in _ERROR_PATTERNS:
        is_error = is_error | s.rlike(pat)
    warnings = F.array_compact(
        F.array(
            F.when(s.rlike(_W_SHORT), F.lit("too_short")),
            F.when(s.rlike(_W_WHITESPACE), F.lit("contains_whitespace")),
            F.when(s.rlike(_W_SPECIAL), F.lit("special_characters")),
            F.lit(None) if numeric_ok else F.when(s.rlike(_W_NUMERIC), F.lit("purely_numeric")),
        )
    )
    severity = (
        F.when(is_error, F.lit("error"))
        .when(F.size(warnings) > 0, F.lit("warning"))
        .otherwise(F.lit("ok"))
    )
    return F.struct(
        (~is_error).alias("valid"), severity.alias("severity"), warnings.alias("warnings")
    )


# --- GSID generation (gsid_generator.py:15-60) -----------------------------

# Crockford base32 without I, L, O, U — exactly the reference alphabet
# (gsid-service/services/gsid_generator.py:12).
GSID_ALPHABET = "0123456789ABCDEFGHJKMNPQRSTVWXYZ"
GSID_REGEX = r"^GSID-[0-9A-HJ-NP-TV-Z]{16}$"


def _base32_expr(num: Column, width: int) -> Column:
    """Fixed-width Crockford-base32 of a non-negative bigint, as a
    fold over digit positions (JVM-side, no UDF)."""
    digits = [
        F.substring(
            F.lit(GSID_ALPHABET),
            (F.shiftrightunsigned(num, 5 * i).bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for i in range(width - 1, -1, -1)
    ]
    return F.concat(*digits)


def gsid_expr(seed: Column, ts_ms: Column | None = None) -> Column:
    """Mint a GSID: 'GSID-' + base32(ms timestamp)[5] + base32(seed-hash)[11].

    The reference uses secrets.randbelow(32**11) for the random part
    (gsid_generator.py:32-60); for a deterministic, partition-safe
    batch mint we derive the 55 random bits from xxhash64(seed) —
    same format contract (test_gsid_format.py:63-74): 21 chars,
    'GSID-' prefix, Crockford alphabet, regex ^GSID-[0-9A-HJ-NP-TV-Z]{16}$.

    ts_ms defaults to a fixed epoch for reproducibility in tests; pass
    unix_millis(current_timestamp()) in production jobs.
    """
    if ts_ms is None:
        ts_ms = F.lit(1700000000000)
    ts_part = _base32_expr(ts_ms.cast("bigint").bitwiseAND(F.lit((1 << 25) - 1)), 5)
    rand_bits = F.abs(F.xxhash64(seed)).bitwiseAND(F.lit((1 << 55) - 1))
    rand_part = _base32_expr(rand_bits, 11)
    return F.concat(F.lit("GSID-"), ts_part, rand_part)


def flexible_timestamp_expr(col: Column) -> Column:
    """ISO string or epoch-milliseconds -> timestamp (P15,
    labkey-sync/services/labkey_client.py:83-101). Millis are
    recognized by shape (>= 12 digits) so 2001-2286 epochs parse;
    anything else goes through the normal timestamp parser."""
    s = F.trim(col.cast("string"))
    return F.when(
        s.rlike(r"^\d{12,}$"), F.timestamp_millis(s.cast("bigint"))
    ).otherwise(F.try_to_timestamp(s))
