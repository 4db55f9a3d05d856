package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.feed.{ChangeFeed, FeedConfig}
import graft.model.Schemas

/** Event-time windowed aggregation over the change feed as a stream —
  * watermark + tumbling window (SURVEY §2.10 T6): the streaming result
  * must equal the same aggregation computed in batch.
  */
class StreamingWindowSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts == batch windowed counts") {
    val cfg = FeedConfig(seed = 31L, numEvents = 5000, numDocs = 100, maxTokens = 4)
    val dir = tmpDir("winstream")
    ChangeFeed.writeFeed(spark, cfg, s"$dir/feed", chunks = 5)

    val streamed = spark.readStream.schema(Schemas.changeEvent)
      .option("maxFilesPerTrigger", 2).parquet(s"$dir/feed")
      .withWatermark("ts", "10 minutes")
      .groupBy(window($"ts", "5 minutes"), $"op")
      .agg(count(lit(1)).as("n"))
    val q = streamed.writeStream
      .format("memory").queryName("win_out")
      .outputMode("complete")
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val got = spark.table("win_out")
      .select($"window.start".as("ws"), $"op", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = spark.read.schema(Schemas.changeEvent).parquet(s"$dir/feed")
      .groupBy(window($"ts", "5 minutes"), $"op")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("ws"), $"op", $"n")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected, s"streamed ${got.size} groups vs batch ${expected.size}")
    assert(got.nonEmpty)
  }
}
