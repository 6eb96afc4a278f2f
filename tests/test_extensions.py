"""UDF surface, Kafka-front parsing, and control plane."""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.envelope import envelope_json, to_envelopes
from wing_binlog_go_spark.functions.udf_surface import (
    explode_tokens_udtf,
    weighted_mean,
    zscore_per_group,
)
from wing_binlog_go_spark.sources.changelog import read_changelog, write_fixture_changelog
from wing_binlog_go_spark.sources.kafka_front import parse_kafka_records
from wing_binlog_go_spark.streaming.control import ControlPlane
from wing_binlog_go_spark.tables import read_table


def test_grouped_agg_pandas_udf(spark, sf_dir):
    li = read_table(spark, sf_dir, "lineitem").limit(1000)
    got = (
        li.groupBy("l_returnflag")
        .agg(weighted_mean("l_extendedprice", "l_quantity").alias("wm"))
        .collect()
    )
    # cross-check one group in pandas
    pdf = li.select("l_returnflag", "l_extendedprice", "l_quantity").toPandas()
    g = pdf[pdf.l_returnflag == got[0].l_returnflag]
    expect = (g.l_extendedprice * g.l_quantity).sum() / g.l_quantity.sum()
    assert abs(got[0].wm - expect) < 1e-9


def test_apply_in_pandas_zscore(spark, sf_dir):
    o = read_table(spark, sf_dir, "orders").limit(500)
    z = zscore_per_group(o, "o_custkey", "o_totalprice")
    stats = z.groupBy("o_custkey").agg(
        F.round(F.avg("z"), 6).alias("m"), F.count("*").alias("n")
    )
    bad = stats.filter((F.col("n") > 1) & (F.abs(F.col("m")) > 1e-6)).count()
    assert bad == 0  # per-group mean of z-scores ≈ 0


def test_udtf_matches_posexplode(spark, sf_dir):
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 5)
    via_udtf = explode_tokens_udtf(d, "doc_id", "text").count()
    via_builtin = d.select(F.posexplode(F.split("text", " "))).count()
    assert via_udtf == via_builtin


def test_parse_kafka_records_roundtrip(spark, tmp_path):
    """Producer wire format → consumer parse, without a broker: build
    (key, value) binary rows exactly as the Kafka sink writes them."""
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    env = to_envelopes(read_changelog(spark, str(log)))
    wire = env.select(
        F.col("full_table").cast("binary").alias("key"),
        envelope_json().cast("binary").alias("value"),
    )
    parsed = parse_kafka_records(wire)
    assert parsed.count() == env.count()
    ins = parsed.filter(F.col("event_type") == "insert").orderBy("event_index")
    first = ins.collect()[0]
    assert first.full_table == "fixtures.cdc_typed_all"
    assert first.event.data["c_vchar"] == "row1"
    # malformed value → NULL fields, stream survives (dead-letter route)
    junk = spark.createDataFrame(
        [("k".encode(), b"{not json")], "key binary, value binary"
    )
    dead = parse_kafka_records(junk).collect()[0]
    assert dead.event_type is None


def test_control_plane_stop_reload_members(spark, tmp_path):
    cp = ControlPlane(spark)
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        f.write(json.dumps({"x": 1}) + "\n")

    config = {"name": "ctl_test_q"}

    def starter():
        stream = spark.readStream.schema("x long").json(str(src))
        return (
            stream.writeStream.format("memory")
            .queryName(config["name"])  # re-read on every start = hot reload
            .option("checkpointLocation", str(tmp_path / ("ckpt-" + config["name"])))
            .start()
        )

    cp.register("pipe", starter)
    q = cp.start("pipe")
    deadline = time.time() + 30
    while time.time() < deadline and not any(
        m.name == "ctl_test_q" for m in cp.members()
    ):
        time.sleep(0.5)
    assert any(m.name == "ctl_test_q" and m.is_active for m in cp.members())
    # reload under a new config value
    config["name"] = "ctl_test_q2"
    q2 = cp.reload("pipe")
    assert q2.name == "ctl_test_q2"
    assert not q.isActive  # old instance stopped
    cp.stop_all()
    assert not q2.isActive


def test_orc_and_csv_round_trip_matches_parquet(spark, tmp_path):
    """Format breadth: the engine's tables survive an ORC and a
    header+schema CSV round trip value-identically (Spark's built-in
    writers/readers — a user exporting the replica to either format
    loses nothing on the types the CDC envelope uses)."""
    from wing_binlog_go_spark.tables import read_table

    src = (
        read_table(spark, "/root/testdata/sf0.001", "orders")
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    )
    want = [tuple(r) for r in src.collect()]

    orc_dir = str(tmp_path / "orc")
    src.write.orc(orc_dir)
    got_orc = [
        tuple(r) for r in spark.read.orc(orc_dir).orderBy("o_orderkey").collect()
    ]
    assert got_orc == want

    csv_dir = str(tmp_path / "csv")
    src.write.option("header", True).csv(csv_dir)
    got_csv = [
        tuple(r)
        for r in spark.read.schema(src.schema)
        .option("header", True)
        .csv(csv_dir)
        .orderBy("o_orderkey")
        .collect()
    ]
    assert got_csv == want
