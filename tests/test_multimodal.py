"""Multimodal plumbing: decode stubs are gated, the Arrow mapInPandas
featurizer produces the declared schema with sane batch shapes."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators import (  # noqa: E402
    multimodal,
)


def test_decode_stubs_gated():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"RIFF...")


def test_featurize_schema_and_determinism(spark, sf_dir):
    df = multimodal.q_multimodal_featurize(spark, sf_dir)
    assert [f.name for f in df.schema.fields] == [
        "doc_id", "n_bytes", "checksum_prefix", "fake_embedding_0",
    ]
    rows = df.orderBy("doc_id").limit(5).collect()
    again = df.orderBy("doc_id").limit(5).collect()
    assert rows == again  # deterministic featurizer
    for r in rows:
        assert r["n_bytes"] > 0
        assert len(r["checksum_prefix"]) == 8
        assert 0.0 <= r["fake_embedding_0"] <= 1.0


def test_binary_payload_schema(spark, sf_dir):
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.session import (
        load_table,
    )

    blobs = multimodal.with_binary_payload(load_table(spark, sf_dir, "documents"))
    types = {f.name: f.dataType.simpleString() for f in blobs.schema.fields}
    assert types["payload"] == "binary"
    assert types["payload_size"] == "int"


def test_binary_file_source_roundtrip(spark, tmp_path):
    """binaryFile ingestion: raw blobs -> (path, length, content) rows;
    content survives byte-exact and metadata filters don't touch
    payloads."""
    from auto_tabular_gpu_accelerated_etl_schema_inference_pipeline_spark.operators.multimodal import (
        read_binary_files,
    )

    blobs = {"a.bin": b"\x00\x01\x02" * 100, "b.bin": b"xyz", "skip.txt": b"nope"}
    for name, data in blobs.items():
        (tmp_path / name).write_bytes(data)
    df = read_binary_files(spark, str(tmp_path), glob="*.bin")
    rows = {r["path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.bin", "b.bin"}
    assert bytes(rows["a.bin"]["content"]) == blobs["a.bin"]
    assert rows["a.bin"]["length"] == 300
    big = df.filter("length > 100").count()
    assert big == 1
