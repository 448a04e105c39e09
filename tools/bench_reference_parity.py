"""Reference-parity throughput comparison: pandas (the reference's
execution model) vs this engine, on the reference's own workload shape.

The reference pipeline is eager single-threaded pandas: flatten nested user
JSON -> bulk rename -> per-row custom-fields packing -> type alignment
(``/root/reference/src/lms_to_s3_lambda.py:68-163``,
``s3_to_rds_lambda.py:38-65`` — re-expressed here from its documented
behavior, not copied).  This harness generates N synthetic user records,
runs BOTH implementations' transform stage, checks they agree on a sample,
and prints one JSON line with rows/sec each.

Usage: python tools/bench_reference_parity.py [n_rows]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def make_users(n: int) -> list[dict]:
    return [
        {
            "id": i,
            "externalId": f"X{i:07d}" if i % 11 else None,
            "firstName": f"First{i}",
            "lastName": f"Last{i}",
            "emailAddress": f"u{i}@example.com",
            "departmentId": f"D{i % 7}",
            "dateHired": f"{(i % 12) + 1:02d}-{(i % 28) + 1:02d}-2019 09:00:00",
            "isActive": i % 3 != 0,
            "customFields": {
                "cohort": f"C{i % 5}" if i % 4 else None,
                "mentor": f"m{i % 97}" if i % 2 else None,
            },
        }
        for i in range(n)
    ]


def pandas_transform(users: list[dict]):
    """The reference's eager pandas chain (behavior-equivalent rewrite)."""
    import pandas as pd

    df = pd.json_normalize(users)  # flatten (O3)
    df = df.rename(
        columns={
            "id": "lms_user_id",
            "externalId": "illum_id",
            "firstName": "first_name",
            "lastName": "last_name",
            "emailAddress": "email",
            "departmentId": "department_id",
            "dateHired": "date_hired",
            "isActive": "is_active",
        }
    )  # rename (O4)
    cf_cols = [c for c in df.columns if c.startswith("customFields.")]
    # per-row dropna().to_dict() packing (O5+O6) — the reference's row apply
    cf = df[cf_cols].rename(columns=lambda c: c[len("customFields."):])
    df["custom_fields"] = cf.apply(lambda row: json.dumps(row.dropna().to_dict()), axis=1)
    df = df.drop(columns=cf_cols)
    # T7: format-strict datetime parse
    df["date_hired"] = pd.to_datetime(df["date_hired"], format="%m-%d-%Y %H:%M:%S", errors="coerce")
    return df


def spark_transform(spark, users: list[dict]):
    from pyspark.sql import types as T

    from lms_etl_pipeline_spark import etl

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("externalId", T.StringType()),
            T.StructField("firstName", T.StringType()),
            T.StructField("lastName", T.StringType()),
            T.StructField("emailAddress", T.StringType()),
            T.StructField("departmentId", T.StringType()),
            T.StructField("dateHired", T.StringType()),
            T.StructField("isActive", T.BooleanType()),
            T.StructField(
                "customFields",
                T.StructType(
                    [
                        T.StructField("cohort", T.StringType()),
                        T.StructField("mentor", T.StringType()),
                    ]
                ),
            ),
        ]
    )
    df = spark.createDataFrame(users, schema)
    flat = etl.flatten_struct(df)
    renamed = etl.rename_columns(flat)
    packed = etl.pack_custom_fields(renamed, prefix="customFields.")
    return etl.parse_datetime_columns(packed, ["date_hired"])


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    users = make_users(n)

    t0 = time.perf_counter()
    pdf = pandas_transform(users)
    t_pandas = time.perf_counter() - t0

    from lms_etl_pipeline_spark.session import get_spark

    spark = get_spark("ref-parity")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: JVM + Arrow path, excluded from the measurement like the
    # reference's Lambda cold start would be
    spark_transform(spark, users[:100]).count()

    t0 = time.perf_counter()
    sdf = spark_transform(spark, users)
    n_out = sdf.count()
    t_spark = time.perf_counter() - t0
    assert n_out == n == len(pdf)

    # spot-check agreement on the packing + strict-parse semantics
    srow = {r["lms_user_id"]: r for r in sdf.filter("lms_user_id < 5").collect()}
    prow = pdf[pdf.lms_user_id < 5].set_index("lms_user_id", drop=False)
    for i in range(5):
        assert json.loads(srow[i]["custom_fields"]) == json.loads(prow.loc[i, "custom_fields"])

    print(
        json.dumps(
            {
                "rows": n,
                "pandas_sec": round(t_pandas, 2),
                "spark_sec": round(t_spark, 2),
                "pandas_rows_per_sec": int(n / t_pandas),
                "spark_rows_per_sec": int(n / t_spark),
                "speedup": round(t_pandas / t_spark, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
