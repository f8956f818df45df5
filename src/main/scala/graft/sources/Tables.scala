package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table catalog over the driver fixtures (TESTDATA.md).
  *
  * The reference models collections declaratively (JSON Schemas +
  * statistics, reference `main.py:114-134`, `challenge/loader.py:35-107`);
  * here a "collection" is a real parquet-backed DataFrame. Scans go
  * through `spark.read.parquet` so Catalyst's FileSourceScanExec gets
  * predicate pushdown + column pruning for free — the rebuild's analog of
  * the reference's full/shard/index scan strategies
  * (`challenge/simulator.py:57-67`) is partition pruning + row-group
  * skipping, which need no hand-rolled access-path selection.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed table roots
  * rather than single files; all call sites take the directory as a
  * parameter so the layout can change without touching operators.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Session configs every graft entry point needs.
    *   - `nanosAsLong`: the events fixture stores parquet INT64
    *     TIMESTAMP(NANOS), which Spark 4.x refuses to read natively —
    *     surfaced as a long that [[events]] converts to a microsecond
    *     timestamp.
    *   - object-hash fallback threshold: the sketch aggregates
    *     (`graft.functions.MinHashSketch`/`SimHashSketch`) run under
    *     ObjectHashAggregateExec, whose default 128-key fallback degrades
    *     to sort-based aggregation on any realistic group count; the
    *     buffers are small (≤512 B/group), so hash aggregation stays the
    *     right plan well past this bound. */
  val requiredConfs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.objectHashAggregate.sortBased.fallbackThreshold" -> "1000000")

  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  /** `ts` arrives as long nanoseconds (see [[requiredConfs]]); convert to a
    * microsecond timestamp with integer division (`DIV` — exact long
    * arithmetic; a double division would round at 1e18 magnitudes), which
    * truncates exactly like DuckDB's native TIMESTAMP_NS → TIMESTAMP read
    * of the same file. */
  def events(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "events").withColumn(
      "ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register all fixture tables as temp views so `spark.sql` works over
    * them (mini-SQL front end, SURVEY §2.3). `events` goes through the
    * timestamp conversion above, not the raw long-nanos read. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
