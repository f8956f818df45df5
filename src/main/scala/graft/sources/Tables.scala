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

  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register all fixture tables as temp views so `spark.sql` works over
    * them (mini-SQL front end, SURVEY §2.3). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
