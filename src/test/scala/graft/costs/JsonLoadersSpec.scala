package graft.costs

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Format-fidelity suite: load the reference's OWN config files and assert
  * the loaders produce exactly the inline datasets the parity suite pins
  * (so a reference user's JSON configs work unchanged). Skipped cleanly if
  * the reference checkout is absent. */
class JsonLoadersSpec extends AnyFunSuite {

  private val refRoot = Paths.get("/root/reference")
  private def available = Files.isDirectory(refRoot)

  /** Field order inside a collection is semantically irrelevant (sizing
    * sums over fields; lookup is by name) and Jackson's node map does not
    * preserve document order — compare canonicalized. */
  private def canon(s: Map[String, ChallengeModel.CollectionSchema]) =
    s.view.mapValues(c => c.copy(fields = c.fields.sortBy(_._1))).toMap

  test("challenge schema.json loads to the inline schemas") {
    assume(available)
    val loaded = JsonLoaders.loadChallengeSchema(refRoot.resolve("challenge/schema.json"))
    assert(canon(loaded) == canon(ChallengeModel.refSchemas))
  }

  test("challenge stats.json loads to the inline stats + cluster + frequencies") {
    assume(available)
    val (cluster, stats, freqs) =
      JsonLoaders.loadChallengeStats(refRoot.resolve("challenge/stats.json"))
    assert(cluster == ChallengeModel.refCluster)
    assert(stats == ChallengeModel.refStats)
    assert(freqs == Map("Q1" -> 1000.0, "Q2" -> 100.0))
  }

  test("challenge denormalizations.json loads to the inline specs") {
    assume(available)
    val loaded =
      JsonLoaders.loadDenormalizations(refRoot.resolve("challenge/denormalizations.json"))
    assert(loaded == ChallengeModel.refDenorms)
  }

  test("challenge queries.json loads to the inline query specs") {
    assume(available)
    val loaded =
      JsonLoaders.loadChallengeQueries(refRoot.resolve("challenge/queries.json"))
    assert(loaded == ChallengeModel.refQueries)
  }

  test("homework db1.json: loaded Stock/OrderLine size exactly like the inline trees") {
    assume(available)
    val set = JsonLoaders.loadSchemaSet(refRoot.resolve("schemas/db1.json"))
    val stats = DocCollectionStats(nbDocuments = 1L)
    assert(DocSchema.documentSizeBytes(set("Stock"), stats) ==
      DocSchema.documentSizeBytes(RefSchemas.db1Stock, stats))
    assert(DocSchema.documentSizeBytes(set("OrderLine"), stats) ==
      DocSchema.documentSizeBytes(RefSchemas.db1OrderLine, stats))
    // db1 Product resolves a whole-file $ref (product.json), with nested
    // object + array composites sized per the reference walker
    val productStats = DocCollectionStats(nbDocuments = 1L,
      avgArrayLengths = Map("categories" -> 2L))
    assert(DocSchema.documentSizeBytes(set("Product"), productStats) > 0)
  }

  test("chapter5 schema sets: fragment $refs resolve and sizes match inline") {
    assume(available)
    val stats = JsonLoaders.loadChapter5Stats(
      refRoot.resolve("data/chapter5/stats.json"))._2
    Seq("DB1", "DB2").foreach { db =>
      val set = JsonLoaders.loadSchemaSet(
        refRoot.resolve(s"data/chapter5/schemas/$db.json"))
      val inline = RefSchemas.chapter5Db(db)
      Seq("Movie", "Review", "User").foreach { c =>
        assert(DocSchema.documentSizeBytes(set(c), stats(c)) ==
          inline(c).documentSizeBytes, s"$db.$c")
      }
    }
  }

  test("chapter5 run from LOADED configs equals the inline parity totals") {
    assume(available)
    val (_, stats) = JsonLoaders.loadChapter5Stats(
      refRoot.resolve("data/chapter5/stats.json"))
    val set = JsonLoaders.loadSchemaSet(
      refRoot.resolve("data/chapter5/schemas/DB1.json"))
    val db = Seq("Movie", "Review", "User").map(c =>
      c -> DocCollectionModel(c, set(c), stats(c))).toMap
    val model = CostModel()
    val weighted = Chapter5Sim.defaultSpecs.map { spec =>
      val r = Chapter5Sim.simulatePlan(Chapter5Sim.buildPlan(spec), db, model)
      model.scale(r.totalCost, spec.frequency)
    }
    val total = model.aggregate("DB1:total", weighted)
    assert(total.timeCost == 4.254943877458572)
  }
}
