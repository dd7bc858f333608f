"""Streaming/batch unified-engine equivalence: the same windowed
aggregation over the same bounded input must produce identical results
through the streaming and batch paths."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_stream_equals_batch(spark, sf_dir):
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.timeseries import (
        q_events_tumbling_window,
    )
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.streaming.windows import (
        run_tumbling_stream,
    )

    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in q_events_tumbling_window(spark, sf_dir).collect()
    }
    stream = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in run_tumbling_stream(spark, sf_dir).collect()
    }
    assert batch == stream
