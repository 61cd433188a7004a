import pytest

from gordo_spark.functions import (
    offset_alias_to_interval,
    offset_alias_to_seconds,
    row_filter_to_sql,
)


def test_offset_aliases():
    assert offset_alias_to_seconds("10T") == 600
    assert offset_alias_to_seconds("10min") == 600
    assert offset_alias_to_seconds("2T") == 120
    assert offset_alias_to_seconds("48H") == 48 * 3600
    assert offset_alias_to_seconds("30S") == 30
    assert offset_alias_to_interval("10T") == "INTERVAL 600 SECOND"


def test_offset_alias_calendar_rejected():
    with pytest.raises(ValueError):
        offset_alias_to_seconds("1M")


def test_row_filter_rewrite():
    assert (
        row_filter_to_sql("`tag-0` > 0.1 & `tag-1` < 0.9")
        == "`tag-0` > 0.1 AND `tag-1` < 0.9"
    )
    assert row_filter_to_sql("~(a == 2) | b != 3") == "NOT ( a = 2 ) OR b != 3"
    # tag names with spaces survive inside backticks
    assert (
        row_filter_to_sql("`GRA-TE  -23-0733.PV` >= 0.5")
        == "`GRA-TE  -23-0733.PV` >= 0.5"
    )


def test_row_filter_spark_executable(spark):
    df = spark.createDataFrame(
        [(0.2, 0.5), (0.05, 0.5), (0.2, 0.95)], ["tag-0", "tag-1"]
    )
    sql = row_filter_to_sql("`tag-0` > 0.1 & `tag-1` < 0.9")
    assert df.filter(sql).count() == 1
