"""applyInPandasWithState operator: the streaming per-user monitor must
equal its batch-mode fold on the same bounded input."""

from __future__ import annotations

import pytest

from nyc_tlc_analytics_pipeline_spark.sources.testdata import load_table
from nyc_tlc_analytics_pipeline_spark.streaming.events import read_event_stream
from nyc_tlc_analytics_pipeline_spark.streaming.stateful import (
    batch_equivalent,
    user_value_monitor,
)

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_state"))
    load_table(spark, SF_SMOKE, "events").repartition(2).write.mode("overwrite").parquet(d)
    return d


def test_stateful_monitor_matches_batch_fold(spark, stream_dir):
    stream = user_value_monitor(
        read_event_stream(spark, stream_dir, max_files_per_trigger=100)
    )
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("user_monitor")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.user_id: (r.n_events, round(r.ewma_value, 9), r.max_value)
        for r in spark.table("user_monitor").collect()
    }
    expected = {
        r.user_id: (r.n_events, round(r.ewma_value, 9), r.max_value)
        for r in batch_equivalent(load_table(spark, SF_SMOKE, "events")).collect()
    }
    assert got == expected
    assert len(got) > 0
