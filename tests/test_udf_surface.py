"""UDF/UDTF surface capabilities (SURVEY.md §2.11) + multimodal plumbing
(binary columns through Arrow batches) — engine capabilities not declared
as driver queries."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from gpe import multimodal
from gpe.io import load_table

SF = "/root/testdata/sf0.001"


def test_udtf_token_emitter(spark):
    """Spark 4 Python UDTF: (token, position) emitter ≡ posexplode."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="token: string, pos: int")
    class Tokenize:
        def eval(self, text: str):
            for i, t in enumerate(text.split(" ")):
                yield t, i

    spark.udtf.register("tokenize", Tokenize)
    load_table(spark, SF, "documents").createOrReplaceTempView("docs_udtf")
    got = spark.sql(
        "SELECT d.doc_id, t.token, t.pos FROM docs_udtf d, "
        "LATERAL tokenize(d.text) t WHERE d.doc_id < 5"
    )
    want = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < 5)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
        .select("doc_id", "token", "pos")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_plain_python_udf_unit(spark):
    """Row-at-a-time UDF works but stays out of declared hot paths."""
    tag = F.udf(lambda s: s.upper() if s else None)
    out = (
        load_table(spark, SF, "region")
        .select(tag(F.col("r_name")).alias("u"))
        .collect()
    )
    assert {r.u for r in out} == {"AFRICA", "AMERICA", "ASIA", "EUROPE",
                                  "MIDDLE EAST"}


def test_multimodal_payload_schema(spark):
    media = multimodal.attach_payload(load_table(spark, SF, "documents"))
    assert [f.name for f in media.schema.fields] == ["media_id", "payload", "meta"]
    assert media.schema["payload"].dataType.typeName() == "binary"
    row = media.first()
    assert row.meta.n_bytes == len(row.payload)
    assert row.meta.mime == "text/plain"


def test_multimodal_feature_extraction_batch_shape(spark):
    media = multimodal.attach_payload(load_table(spark, SF, "documents"))
    feats = multimodal.extract_features(media)
    rows = feats.collect()
    assert len(rows) == 500
    assert all(len(r.features) == multimodal.FEATURE_DIM for r in rows)
    # feature[0] = payload length (deterministic stub contract)
    assert all(r.features[0] == float(r.n_bytes) for r in rows)


def test_multimodal_decode_stub_gates_unknown_mime():
    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"\x00\x01", "image/png")


def test_partitioned_parquet_sink_roundtrip(spark, tmp_path):
    """Lake sink capability (§2.1): partitioned write + partition-pruned read."""
    from gpe.io import load_table as lt, write_partitioned

    li = lt(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_returnflag")
    out = str(tmp_path / "li_part")
    write_partitioned(li, out, "l_returnflag")
    back = spark.read.parquet(out)
    assert back.count() == li.count()
    # partition pruning: reading one flag touches only that directory
    one = back.filter(F.col("l_returnflag") == "A")
    assert one.count() == li.filter(F.col("l_returnflag") == "A").count()
    import os

    assert any(p.startswith("l_returnflag=") for p in os.listdir(out))
