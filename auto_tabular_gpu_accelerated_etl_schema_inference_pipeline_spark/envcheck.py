"""Environment check (reference O14, /root/reference/check.py:1-6: torch
version / CUDA availability / device name). Spark-first equivalent:
session + runtime + acceleration report, with the GPU strictly optional —
the engine runs the vectorized-CPU lane when no device exists (the
reference hard-exits instead, etl_benchmark.py:96-98)."""

from __future__ import annotations

from pyspark.sql import SparkSession


def engine_info(spark: SparkSession | None = None) -> dict:
    import pyspark

    info: dict = {
        "pyspark_version": pyspark.__version__,
        "gpu_available": False,
        "gpu_name": None,
    }
    try:
        import torch

        info["torch_version"] = torch.__version__
        info["gpu_available"] = torch.cuda.is_available()
        if info["gpu_available"]:
            info["gpu_name"] = torch.cuda.get_device_name(0)
    except ImportError:
        info["torch_version"] = None

    if spark is not None:
        info["spark_master"] = spark.sparkContext.master
        info["default_parallelism"] = spark.sparkContext.defaultParallelism
        for key in (
            "spark.sql.adaptive.enabled",
            "spark.sql.execution.arrow.pyspark.enabled",
            "spark.sql.shuffle.partitions",
            "spark.sql.session.timeZone",
        ):
            info[key] = spark.conf.get(key, None)
    return info


if __name__ == "__main__":
    from .session import get_spark

    for k, v in engine_info(get_spark(app_name="envcheck")).items():
        print(f"{k}: {v}")
