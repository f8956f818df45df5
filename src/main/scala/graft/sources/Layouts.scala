package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-layout writers — the user-facing form of the 100 TB layout story
  * (SCALING.md). The reference models sharded collections declaratively;
  * on Spark the two layouts that matter are:
  *
  *   - **bucketed**: hash-bucketed + sorted on the dominant join/group
  *     key. Scans satisfy `ClusteredDistribution` on that key, so
  *     Catalyst elides the Exchange for aligned aggregates and joins —
  *     `BucketedLayoutSpec` proves ZERO-shuffle plans on it.
  *   - **sharded**: directory-partitioned on a derived shard column.
  *     Equality filters on the shard key prune to 1/n of the directories
  *     at planning time (partition pruning; the executable analog of the
  *     reference's shard-targeted scan).
  *
  * Both writers pay their one shuffle at WRITE time; every aligned query
  * afterwards reads shuffle-free. That trade is the reference's
  * sharding-cost model made executable.
  */
object Layouts {

  /** Write `df` hash-bucketed and sorted on `key` into `numBuckets`
    * buckets as an external table at `path`, registered as `name`. */
  def writeBucketed(df: DataFrame, name: String, path: String,
      key: String, numBuckets: Int): Unit =
    writeBucketedOn(df, name, path, Seq(key), numBuckets)

  /** Multi-key form: the bucket hash runs over ALL of `keys`, so a join
    * or aggregate on exactly those keys reads the buckets shuffle-free
    * (a composite-keyed index layout — e.g. the (band, bandHash) dedup
    * band index). */
  def writeBucketedOn(df: DataFrame, name: String, path: String,
      keys: Seq[String], numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(name)

  /** Write `df` directory-partitioned on `shard = pmod(shardKey, n)`. */
  def writeSharded(df: DataFrame, path: String,
      shardKey: String, numShards: Int): Unit =
    df.withColumn("shard", pmod(col(shardKey), lit(numShards)).cast("int"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Read a sharded layout back (partition pruning applies to `shard`
    * equality filters). */
  def readSharded(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Compact a parquet directory into ~`targetBytes`-sized files, sorted
    * by `sortKey` — the small-files remedy every continuously-ingesting
    * table needs: streaming sinks and fine-grained shards accumulate
    * thousands of KB-scale files whose open/footer overhead dominates
    * scans long before the data does. Output file count is sized from
    * the INPUT's actual on-disk bytes (not row counts — rows don't
    * predict compressed size); `repartitionByRange` on the sort key
    * gives files that are both right-sized and range-clustered, so
    * min/max footer stats prune `sortKey` predicates after compaction
    * (the same pruning the sharded layout buys at directory level,
    * pushed down to file level).
    *
    * One range shuffle over the compacted slice, driver work is O(file
    * listing). Returns the output file count. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      sortKey: String, targetBytes: Long): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(inPath), spark.sparkContext.hadoopConfiguration)
    val inBytes = fs.getContentSummary(
      new org.apache.hadoop.fs.Path(inPath)).getLength
    val nFiles = math.max(1, math.ceil(inBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(inPath)
      .repartitionByRange(nFiles, col(sortKey))
      .sortWithinPartitions(col(sortKey))
      .write.mode("overwrite").parquet(outPath)
    fs.listStatus(new org.apache.hadoop.fs.Path(outPath))
      .count(f => f.getPath.getName.endsWith(".parquet"))
  }
}
