"""pyspark.pandas parity: the reference's own pandas idioms, distributed.

The reference is a pandas pipeline (rename dict, to_datetime coerce,
numeric coerce with nullable ints — SURVEY.md §2.2/§2.3).  A user porting
it wholesale can keep the pandas API and run it on Spark via
``pyspark.pandas``; these tests pin that the reference's exact call shapes
behave the same distributed (and document the intended divergences the
engine's native path makes deliberate).
"""

from __future__ import annotations

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def ps(spark):
    ps = pytest.importorskip("pyspark.pandas")
    ps.set_option("compute.ops_on_diff_frames", True)
    return ps


def test_rename_dict_matches_pandas(ps):
    # reference O4: df.rename(columns=mapping)
    mapping = {"id": "lms_user_id", "externalId": "illum_id"}
    raw = pd.DataFrame({"id": [1, 2], "externalId": ["a", "b"], "keep": [0.5, 1.5]})
    expected = raw.rename(columns=mapping)
    got = ps.DataFrame(raw).rename(columns=mapping).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("lms_user_id").reset_index(drop=True),
        expected.sort_values("lms_user_id").reset_index(drop=True),
    )


def test_to_datetime_coerce_matches_pandas(ps):
    # reference T7: pd.to_datetime(errors='coerce', format=...) — bad rows -> NaT
    vals = ["01-31-2024 10:00:00", "2024-01-31T10:00:00", "garbage", None]
    expected = pd.to_datetime(pd.Series(vals), format="%m-%d-%Y %H:%M:%S", errors="coerce")
    got = ps.to_datetime(
        ps.Series(vals), format="%m-%d-%Y %H:%M:%S", errors="coerce"
    ).to_pandas()
    assert list(got.isna()) == list(expected.isna())
    assert got.dropna().tolist() == expected.dropna().tolist()


def test_numeric_coerce_nullable_int_matches_pandas(ps):
    # reference T2: pd.to_numeric(errors='coerce').astype('Int64'), NaN -> <NA>
    vals = ["10", "x", None, "30"]
    expected = pd.to_numeric(pd.Series(vals), errors="coerce").astype("Int64")
    got = (
        ps.to_numeric(ps.Series(vals), errors="coerce").astype("Int64").to_pandas()
    )
    assert list(got.isna()) == list(expected.isna())
    assert got.dropna().tolist() == expected.dropna().tolist()
