package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

/** Exposes the library's native expressions to SQL.
  *
  * Two wiring paths share one builder table:
  *   - `spark.sql.extensions=graft.functions.GraftExtensions` — the
  *     standard cluster-deployment hook ([[SparkSessionExtensions]]
  *     `injectFunction`), applied when the session is built;
  *   - [[GraftFunctions.registerAll]] — registers the same builders into
  *     an already-running session (tests, notebooks, the `SparkEntry`
  *     entry points), so `spark.sql("SELECT poly_hash(text) …")` works
  *     next to the Column API.
  *
  * `GraftExtensionsSpec` pins SQL-path ≡ Column-API equality per function.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name),
          new ExpressionInfo("graft.functions", name),
          builder))
    }
    // whole-operator extension: window top-k → bounded-heap physical plan
    ext.injectOptimizerRule(_ => graft.plans.RewriteWindowTopK)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftFunctions {

  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): Seq[Expression] => Expression =
    args =>
      if (args.length == n) f(args)
      else throw new IllegalArgumentException(
        s"$name expects $n arguments, got ${args.length}")

  /** name → builder, the single source for both wiring paths. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "poly_hash" -> arity("poly_hash", 1)(a => PolyHash(a.head)),
    "word_shingles" -> arity("word_shingles", 2) {
      case Seq(ws, Literal(n: Int, IntegerType)) => WordShingles(ws, n)
      case _ => throw new IllegalArgumentException(
        "word_shingles expects (array<string>, integer literal)")
    },
    "cosine_similarity" -> arity("cosine_similarity", 2)(a =>
      CosineSimilarity(a(0), a(1))),
    "dot_product" -> arity("dot_product", 2)(a => DotProduct(a(0), a(1))),
    "minhash_sketch" -> arity("minhash_sketch", 2) {
      case Seq(h, Literal(n: Int, IntegerType)) =>
        MinHashSketch(h, n).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "minhash_sketch expects (long column, integer literal)")
    },
    "simhash_sketch" -> arity("simhash_sketch", 1)(a =>
      SimHashSketch(a.head).toAggregateExpression()),
    "vector_sum" -> arity("vector_sum", 2) {
      case Seq(v, Literal(d: Int, IntegerType)) =>
        VectorSumSketch(v, d).toAggregateExpression()
      case _ => throw new IllegalArgumentException(
        "vector_sum expects (array<double> column, integer literal)")
    },
    "minhash_bands_of" -> arity("minhash_bands_of", 3) {
      case Seq(sh, Literal(h: Int, IntegerType), Literal(b: Int, IntegerType)) =>
        MinHashBandsOf(sh, h, b)
      case _ => throw new IllegalArgumentException(
        "minhash_bands_of expects (array<string>, integer literal, integer literal)")
    },
    "simhash_bands_of" -> arity("simhash_bands_of", 1)(a =>
      SimHashBandsOf(a.head)),
    "winnow_fingerprints" -> arity("winnow_fingerprints", 3) {
      case Seq(ws, Literal(k: Int, IntegerType), Literal(w: Int, IntegerType)) =>
        WinnowFingerprints(ws, k, w)
      case _ => throw new IllegalArgumentException(
        "winnow_fingerprints expects (array<string>, integer literal, integer literal)")
    })

  /** Register every builder into an existing session. */
  def registerAll(spark: SparkSession): Unit =
    builders.foreach { case (name, builder) =>
      org.apache.spark.sql.graftbridge.FunctionBridge
        .register(spark, name, builder)
    }
}
