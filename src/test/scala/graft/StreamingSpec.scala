package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** readStream smoke: the tumbling-window aggregation produces identical
  * results via Structured Streaming (file source, one micro-batch) and
  * the batch query (SURVEY.md §5.2 item 5). */
class StreamingSpec extends SparkSpec {

  test("tumbling window: streaming result == batch result") {
    val streamDir = Files.createTempDirectory("graft_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val stream = graft.streaming.Events.tumblingStream(spark, streamDir.toString)
    val q = stream.writeStream
      .format("memory").queryName("tumbling_smoke")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("tumbling_smoke")
      .orderBy("win_start", "event_type").collect()
    val batch = graft.streaming.Events.streamTumbling(spark, sfDir).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
  }

  test("flatMapGroupsWithState: streaming result == batch result") {
    val streamDir = Files.createTempDirectory("graft_state_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val stream = graft.streaming.Events.statefulStream(spark, streamDir.toString)
    val q = stream.writeStream
      .format("memory").queryName("stateful_smoke")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("stateful_smoke").orderBy("user_id").collect()
    val batch = graft.streaming.Events
      .streamStatefulSessions(spark, sfDir).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
  }

  test("foreachBatch sink: streamed micro-batches land in parquet and match batch") {
    val streamDir = Files.createTempDirectory("graft_feb_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    val outDir = Files.createTempDirectory("graft_feb_out").toString

    val stream = graft.streaming.Events.tumblingStream(spark, streamDir.toString)
    val q = stream.writeStream
      .outputMode("complete")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        batch.write.mode("overwrite").parquet(outDir)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val landed = spark.read.parquet(outDir)
      .orderBy("win_start", "event_type").collect()
    val batch = graft.streaming.Events.streamTumbling(spark, sfDir).collect()
    assert(landed.length == batch.length)
    assert(landed.map(_.toString).sameElements(batch.map(_.toString)))
  }

  test("update output mode: per-key aggregate streams with watermark") {
    val streamDir = Files.createTempDirectory("graft_upd_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val stream = graft.streaming.Events.tumblingStream(spark, streamDir.toString)
    val q = stream.writeStream
      .format("memory").queryName("update_smoke")
      .outputMode("update")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    // one micro-batch → update mode emits every changed (= every) group
    val streamed = spark.table("update_smoke")
      .orderBy("win_start", "event_type").collect()
    val batch = graft.streaming.Events.streamTumbling(spark, sfDir).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
  }

  test("stream-stream interval join: streaming result == batch result") {
    val streamDir = Files.createTempDirectory("graft_ssj_stream")
    Files.copy(Paths.get(s"$sfDir/events.parquet"),
      streamDir.resolve("events.parquet"), StandardCopyOption.REPLACE_EXISTING)

    val stream = graft.streaming.Events.intervalJoinStream(spark, streamDir.toString)
    val q = stream.writeStream
      .format("memory").queryName("ssj_smoke")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("ssj_smoke")
      .orderBy("user_id", "click_id", "purchase_id").collect()
    val batch = graft.streaming.Events.streamIntervalJoin(spark, sfDir).collect()
    assert(streamed.length == batch.length)
    assert(streamed.map(_.toString).sameElements(batch.map(_.toString)))
  }

  test("stateful dedup twin: dropDuplicates over stream equals batch first-rows count") {
    val batch = graft.streaming.Events.streamDedupFirst(spark, sfDir).count()
    val direct = Tables.events(spark, sfDir)
      .select("user_id", "event_type").distinct().count()
    assert(batch == direct)
  }
}
