package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join: the streaming form of
  * `Events.rangeJoin` (errors within the hour before a purchase by the
  * same user). Both sides are watermarked streams; the join condition
  * carries the event-time bound, which is what lets Spark expire state:
  * an error row can only match purchases up to one hour ahead, so once
  * the watermark passes `error_ts + 1h` the row's state is dropped.
  * Inner-join matches emit as soon as both sides arrive — no
  * end-of-stream flush is needed for result completeness.
  *
  * `StreamingJoinsSpec` pins the streamed result set equal to the batch
  * bin-bucketed decomposition (which itself hash-matches the DuckDB
  * inequality-join oracle) — three implementations, one semantics. */
object StreamingJoins {

  def rangeJoinStreaming(spark: SparkSession, dir: String): DataFrame = {
    // the two join sides each need their OWN file-source stream over the
    // same staged dir, so the helper's stream seeds one side's schema and
    // both sides are rebuilt from the returned schema
    val (_, streamDir, rawSchema) = StreamingStaging.stageParquetStream(
      spark, dir, "events", "graft_stream_join")
    def stream() = spark.readStream.schema(rawSchema).parquet(streamDir.toString)
      .transform(graft.sources.Tables.normalizeEventTs)
    val errs = stream().filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id").as("e_user"),
        col("ts").as("error_ts"))
      .withWatermark("error_ts", "1 second")
    val purch = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 second")
    val joined = purch.join(errs,
      col("user_id") === col("e_user") &&
        col("error_ts") > col("purchase_ts") - expr("INTERVAL 1 HOUR") &&
        col("error_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("error_id"), col("user_id"),
        col("purchase_ts"), col("error_ts"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("error_ts")))
          .as("gap_us"))
    val sink = s"graft_sjoin_${java.util.UUID.randomUUID().toString.replace("-", "")}"
    StreamingStaging.runAndConsume(spark, sink, streamDir)(
      joined.writeStream.format("memory").queryName(sink)
        .outputMode("append").start())
  }
}
