"""applyInPandasWithState operator test: state persists across
micro-batches (SURVEY §2.6 new-capability surface)."""

from deltacat_spark.streaming.stateful import running_key_totals


def test_running_totals_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    sink_ck = str(tmp_path / "ck")

    def write_batch(rows):
        spark.createDataFrame(rows, "k string, v double").coalesce(1).write.mode(
            "append"
        ).parquet(src)

    write_batch([("a", 1.0), ("a", 2.0), ("b", 5.0)])
    stream = spark.readStream.schema("k string, v double").parquet(src)
    out = running_key_totals(stream, "k", "v")

    def run_once(qname):
        got = {}

        def _collect(batch_df, batch_id):
            for r in batch_df.collect():
                got[r.key] = (r.total_count, r.total_value)

        q = (
            out.writeStream.foreachBatch(_collect)
            .outputMode("update")
            .option("checkpointLocation", sink_ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    first = run_once("state1")
    assert first["a"] == (2, 3.0) and first["b"] == (1, 5.0)

    # second batch: state must carry over (a: 2+1 rows, 3.0+4.0)
    write_batch([("a", 4.0), ("c", 7.0)])
    second = run_once("state2")
    assert second["a"] == (3, 7.0)
    assert second["c"] == (1, 7.0)
