"""End-to-end TimeSeriesDataset plan vs a pandas reference implementation
(the reference's layer-4 strategy: config -> get_data parity, SURVEY.md §5)."""

import numpy as np
import pandas as pd
import pytest

from gordo_spark.operators.filters import InsufficientDataError
from gordo_spark.plans import TimeSeriesDataset
from gordo_spark.sources.providers import ParquetDataProvider

TAGS = ["tag-0", "tag-2", "GRA-TE  -23-0733.PV"]


@pytest.fixture(scope="module")
def lake(tmp_path_factory, sensor_pdf):
    path = str(tmp_path_factory.mktemp("lake") / "sensors.parquet")
    sensor_pdf.assign(ts=sensor_pdf.ts.astype("datetime64[us]")).to_parquet(path)
    return path


def pandas_get_data(pdf, tags, resolution="10min", limit_buckets=288):
    series = {}
    for tag in tags:
        s = (
            pdf[pdf.tag == tag]
            .set_index("ts")["value"]
            .resample(resolution)
            .mean()
        )
        s = s.interpolate("linear", limit=limit_buckets, limit_area="inside")
        series[tag] = s
    wide = pd.concat(series, axis=1).dropna()
    return wide[list(tags)]


def test_get_data_matches_pandas(spark, sensor_pdf, lake):
    ds = TimeSeriesDataset(
        tag_list=TAGS,
        resolution="10T",
        interpolation_method="linear_interpolation",
        interpolation_limit="48H",
        data_provider=ParquetDataProvider(lake),
    )
    X, y = ds.get_data(spark)
    got = X.toPandas().set_index("ts").sort_index()
    exp = pandas_get_data(sensor_pdf, TAGS)
    assert list(got.columns) == list(exp.columns)
    assert got.shape == exp.shape
    np.testing.assert_allclose(got.values, exp.values, rtol=1e-9)
    # y defaults to tag_list
    assert y.columns == X.columns


def test_get_data_with_row_filter_and_threshold(spark, lake):
    ds = TimeSeriesDataset(
        tag_list=TAGS,
        resolution="10T",
        row_filter="`tag-0` > 0.2",
        row_filter_buffer_size=2,
        n_samples_threshold=10,
        data_provider=ParquetDataProvider(lake),
    )
    X, _ = ds.get_data(spark)
    pdf = X.toPandas()
    assert (pdf["tag-0"] > 0.2).all()

    ds_fail = TimeSeriesDataset(
        tag_list=TAGS,
        n_samples_threshold=10**9,
        data_provider=ParquetDataProvider(lake),
    )
    with pytest.raises(InsufficientDataError):
        ds_fail.get_data(spark)


def test_get_data_time_range_and_targets(spark, lake):
    ds = TimeSeriesDataset(
        tag_list=["tag-0", "tag-2"],
        target_tag_list=["tag-2"],
        train_start_date="2019-01-01T00:00:00+00:00",
        train_end_date="2019-01-01T12:00:00+00:00",
        data_provider=ParquetDataProvider(lake),
    )
    X, y = ds.get_data(spark)
    assert y.columns == ["ts", "tag-2"]
    ts = X.toPandas()["ts"]
    assert ts.max() < pd.Timestamp("2019-01-01 12:00")


def test_get_data_additional_tags(spark, lake):
    """additional_tags are extra X inputs, never part of the y default
    (reference tests/gordo/workflow/test_config_elements.py:140,
    gordo/server/properties.py:86-104)."""
    ds = TimeSeriesDataset(
        tag_list=["tag-0"],
        additional_tags=["tag-2"],
        target_tag_list=["GRA-TE  -23-0733.PV"],
        data_provider=ParquetDataProvider(lake),
    )
    X, y = ds.get_data(spark)
    assert X.columns == ["ts", "tag-0", "tag-2"]
    assert y.columns == ["ts", "GRA-TE  -23-0733.PV"]
    # the additional tag participates in the inner align: same row set
    assert X.count() == y.count()

    # y default stays tag_list (NOT tag_list + additional)
    ds2 = TimeSeriesDataset(
        tag_list=["tag-0"],
        additional_tags=["tag-2"],
        data_provider=ParquetDataProvider(lake),
    )
    X2, y2 = ds2.get_data(spark)
    assert X2.columns == ["ts", "tag-0", "tag-2"]
    assert y2.columns == ["ts", "tag-0"]


def test_additional_tags_config_roundtrip():
    from gordo_spark.builder import dataset_from_dict

    ds = dataset_from_dict(
        {
            "type": "RandomDataset",
            "tag_list": [{"name": "a"}, "b"],
            "additional_tags": [{"name": "c", "asset": "x"}, "d"],
            "target_tag_list": ["b"],
            "data_provider": {"type": "RandomDataProvider"},
        }
    )
    assert ds.additional_tags == ["c", "d"]
    assert ds.x_tags == ["a", "b", "c", "d"]
    assert ds.all_tags == ["a", "b", "c", "d"]


def test_random_provider(spark):
    ds = TimeSeriesDataset(
        tag_list=["a", "b"],
        resolution="10T",
        data_provider={"type": "RandomDataProvider", "min_size": 200, "max_size": 300},
    )
    X, _ = ds.get_data(spark)
    assert X.count() > 0
    assert X.columns == ["ts", "a", "b"]


def test_shared_wide_frames_match_solo_plans(spark, sf_dir):
    from gordo_spark.plans.multi import shared_wide_frames

    common = dict(
        resolution="1H",
        interpolation_method="ffill",
        interpolation_limit="6H",
        data_provider={"type": "EventsAsSensorProvider", "sf_dir": sf_dir},
    )
    datasets = {
        "m1": TimeSeriesDataset(tag_list=["click", "view"], **common),
        "m2": TimeSeriesDataset(
            tag_list=["view", "purchase"],
            row_filter="`view` > 0",
            **common,
        ),
        "m3": TimeSeriesDataset(
            tag_list=["click"],
            train_start_date="2024-01-02 00:00:00",
            train_end_date="2024-01-08 00:00:00",
            **common,
        ),
    }
    shared = shared_wide_frames(spark, datasets)
    assert set(shared) == {"m1", "m2", "m3"}
    for name, ds in datasets.items():
        solo = ds.wide_frame(spark).toPandas().sort_values("ts").reset_index(drop=True)
        multi = shared[name].toPandas().sort_values("ts").reset_index(drop=True)
        pd.testing.assert_frame_equal(solo, multi, check_like=True)


def test_multi_aggregation_wide_frame(spark, sf_dir):
    """aggregation_methods list -> one wide column per (tag, agg), matching
    pandas resample().agg(list) values."""
    ds = TimeSeriesDataset(
        tag_list=["click", "view"],
        resolution="1H",
        aggregation_methods=["mean", "max"],
        interpolation_method="ffill",
        interpolation_limit="6H",
        data_provider={"type": "EventsAsSensorProvider", "sf_dir": sf_dir},
    )
    X, y = ds.get_data(spark)
    assert set(X.columns) == {
        "ts", "click__mean", "click__max", "view__mean", "view__max"
    }
    got = X.toPandas().sort_values("ts").reset_index(drop=True)

    from gordo_spark.sources.providers import EventsAsSensorProvider

    long = EventsAsSensorProvider(sf_dir).read(spark, ["click", "view"]).toPandas()
    exp = (
        long.set_index("ts")
        .groupby("tag")["value"]
        .resample("1h")
        .agg(["mean", "max"])
        .dropna()
    )
    for tag in ["click", "view"]:
        e = exp.loc[tag]
        sub = got.set_index("ts")
        joined = sub.join(e, how="inner")
        assert len(joined) > 50
        np.testing.assert_allclose(joined[f"{tag}__mean"], joined["mean"], rtol=1e-9)
        np.testing.assert_allclose(joined[f"{tag}__max"], joined["max"], rtol=1e-9)


def test_shared_wide_frames_multi_agg(spark, sf_dir):
    from gordo_spark.plans.multi import shared_wide_frames

    common = dict(
        resolution="1H",
        aggregation_methods=["mean", "max"],
        interpolation_method="ffill",
        interpolation_limit="6H",
        data_provider={"type": "EventsAsSensorProvider", "sf_dir": sf_dir},
    )
    datasets = {
        "a": TimeSeriesDataset(tag_list=["click"], **common),
        "b": TimeSeriesDataset(tag_list=["click", "view"], **common),
    }
    shared = shared_wide_frames(spark, datasets)
    for name, ds in datasets.items():
        solo = ds.wide_frame(spark).toPandas().sort_values("ts").reset_index(drop=True)
        multi = shared[name].toPandas().sort_values("ts").reset_index(drop=True)
        assert len(solo) > 50
        pd.testing.assert_frame_equal(solo, multi, check_like=True)
