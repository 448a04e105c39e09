"""Reference-parity ETL transformations (SURVEY.md §2.2–§2.3).

Each function mirrors one transformation of the reference pipeline —
re-expressed as a lazy, vectorized column expression (never a row-wise
Python lambda):

- ``flatten_struct``      <- pd.json_normalize  (lms_to_s3_lambda.py:83)
- ``rename_columns``      <- convert_column_names (lms_to_s3_lambda.py:88-142)
- ``pack_custom_fields``  <- consolidate_custom_fields row-apply
                             (lms_to_s3_lambda.py:145-163)
- ``align_to_schema``     <- convert_dataframe_dtypes (s3_to_rds_lambda.py:38-65)
- ``parse_datetime_columns`` <- parse_datetime_columns (s3_to_rds_lambda.py:116-130)

Documented divergences from the reference's pandas bugs (SURVEY §1.2): we do
NOT replicate the `.0`-strip float corruption (T1), the `'False'`→True
boolean truthiness (T4), or the repr-vs-JSON custom_fields round trip; bad
casts yield NULL (``try_cast``) instead of corrupt values.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "flatten_struct",
    "rename_columns",
    "pack_custom_fields",
    "align_to_schema",
    "parse_datetime_columns",
    "LMS_RENAME_MAP",
]

#: camelCase -> snake_case projection map for the LMS user feed.  Semantics
#: of the reference's 36-entry dict (lms_to_s3_lambda.py:99-137): identity
#: keys renamed to warehouse-style names; representative subset here, callers
#: pass their full map.
LMS_RENAME_MAP: dict[str, str] = {
    "id": "lms_user_id",
    "externalId": "illum_id",
    "firstName": "first_name",
    "lastName": "last_name",
    "emailAddress": "email",
    "departmentId": "department_id",
    "dateHired": "date_hired",
    "dateTerminated": "date_terminated",
    "lastLoginDate": "last_login_date",
    "isActive": "is_active",
}


def flatten_struct(df: DataFrame, sep: str = ".") -> DataFrame:
    """Recursively flatten StructType columns to dotted top-level columns.

    ``{"user": {"name": ..., "geo": {"city": ...}}}`` becomes columns
    ``user.name``, ``user.geo.city`` — the ``pd.json_normalize`` contract,
    but lazy and columnar (one ``select``, zero data movement).
    """

    def expand(df_schema: T.StructType) -> list[Column]:
        out: list[Column] = []

        def walk(path: list[str], dtype: T.DataType) -> None:
            if isinstance(dtype, T.StructType):
                for f in dtype.fields:
                    walk(path + [f.name], f.dataType)
            else:
                qualified = ".".join(f"`{p}`" for p in path)
                out.append(F.col(qualified).alias(sep.join(path)))

        for f in df_schema.fields:
            walk([f.name], f.dataType)
        return out

    return df.select(*expand(df.schema))


def rename_columns(df: DataFrame, mapping: dict[str, str] | None = None) -> DataFrame:
    """Bulk projection-with-aliasing (reference O4).  Unknown keys are
    ignored, unmapped columns pass through — `withColumnsRenamed` is a
    plan-time rewrite, zero execution cost."""
    mapping = LMS_RENAME_MAP if mapping is None else mapping
    present = {k: v for k, v in mapping.items() if k in df.columns}
    return df.withColumnsRenamed(present)


def pack_custom_fields(
    df: DataFrame, prefix: str, out_col: str = "custom_fields", drop: bool = True
) -> DataFrame:
    """Pack all ``prefix``-selected columns into one JSON string column,
    omitting NULL fields (reference O5+O6: per-row ``dropna().to_dict()``).

    Spark's ``to_json`` drops null struct fields by default — the exact
    null-drop semantics the reference implements row-wise, here as one
    codegen'd expression.
    """
    cf_cols = [c for c in df.columns if c.startswith(prefix)]
    packed = F.to_json(
        F.struct(*[F.col(f"`{c}`").alias(c[len(prefix):]) for c in cf_cols])
    )
    out = df.withColumn(out_col, packed)
    return out.drop(*cf_cols) if drop else out


def align_to_schema(df: DataFrame, target: T.StructType, strict_strings: bool = False) -> DataFrame:
    """Schema-on-target alignment (reference S6 + T1–T6): coerce every
    DataFrame column to the target catalog type with NULL-on-error
    semantics; target columns missing from the input are filled with NULL;
    extra input columns are dropped.

    ``strict_strings=True`` reproduces the reference's `'nan' -> ' '`
    single-space fill for string columns (T3) — off by default because a
    NULL is the honest value.
    """
    cols: list[Column] = []
    for field in target.fields:
        if field.name not in df.columns:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
            continue
        c = F.col(field.name)
        if isinstance(field.dataType, T.StringType) and strict_strings:
            cols.append(F.coalesce(c.cast("string"), F.lit(" ")).alias(field.name))
        elif isinstance(field.dataType, (T.StructType, T.MapType, T.ArrayType)):
            # JSON-typed target (T6): serialize, NULL stays NULL.
            cols.append(F.when(c.isNull(), None).otherwise(F.to_json(c)).alias(field.name))
        else:
            cols.append(c.try_cast(field.dataType.simpleString()).alias(field.name))
    return df.select(*cols)


def parse_datetime_columns(
    df: DataFrame, columns: list[str], fmt: str = "MM-dd-yyyy HH:mm:ss"
) -> DataFrame:
    """Format-strict datetime parsing (reference T7): values not matching
    ``fmt`` become NULL (never a job abort), timestamps are session-TZ
    (UTC) normalized.  The format is a parameter — the reference hard-codes
    US-style `%m-%d-%Y %H:%M:%S` while claiming ISO (s3_to_rds_lambda.py:117).
    """
    out = df
    for c in columns:
        out = out.withColumn(c, F.try_to_timestamp(F.col(c), F.lit(fmt)))
    return out
