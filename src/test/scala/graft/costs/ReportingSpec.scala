package graft.costs

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file suite for the reporting sinks: the checked-in goldens under
  * `src/test/resources/challenge_golden/` are the ACTUAL artifacts the
  * reference CLI wrote this session (`python -m challenge.run --out`).
  * leaderboard.md must match byte-for-byte; results.csv is compared
  * value-exactly per cell (Python and Java render shortest-round-trip
  * doubles with different exponent spellings); plan JSON is compared as
  * parsed trees. */
class ReportingSpec extends AnyFunSuite {

  private def golden(name: String): String =
    new String(
      getClass.getResourceAsStream(s"/challenge_golden/$name").readAllBytes(),
      StandardCharsets.UTF_8)

  private val (rows, totals, plans) = ChallengeReporting.runAll()

  test("leaderboard.md is byte-identical to the reference output") {
    val ours = ChallengeReporting.leaderboardMd(
      totals, ChallengeReporting.ordering(totals))
    assert(ours == golden("leaderboard.md"))
  }

  test("results.csv matches the reference row-by-row, cell-by-cell") {
    val ours = ChallengeReporting.resultsCsv(rows)
    val ourLines = ours.split("\r\n").filter(_.nonEmpty)
    val refLines = golden("results.csv").split("\r\n").filter(_.nonEmpty)
    assert(ourLines.length == refLines.length)
    assert(ourLines.head == refLines.head) // header byte-equal
    ourLines.tail.zip(refLines.tail).foreach { case (o, r) =>
      // quoted plan summary may contain the separator — split carefully
      def cells(line: String): List[String] = {
        var out = List.empty[String]
        var cur = new StringBuilder
        var inQ = false
        line.foreach {
          case '"' => inQ = !inQ
          case ',' if !inQ => out = out :+ cur.toString; cur = new StringBuilder
          case c => cur += c
        }
        out :+ cur.toString
      }
      val (oc, rc) = (cells(o), cells(r))
      assert(oc.length == rc.length, s"cell count: $o vs $r")
      // denorm_id, query_id, summary: exact strings
      assert(oc.take(3) == rc.take(3))
      // time, carbon, price: exact doubles after parsing
      (3 to 5).foreach(i => assert(oc(i).toDouble == rc(i).toDouble,
        s"col $i: ${oc(i)} vs ${rc(i)}"))
      // docs/bytes: exact longs
      (6 to 9).foreach(i => assert(oc(i).toLong == rc(i).toLong))
    }
  }

  test("plan JSON matches the reference as a parsed tree (query1, query2)") {
    val mapper = new ObjectMapper()
    Seq("Q1" -> "query1", "Q2" -> "query2").foreach { case (qid, stub) =>
      val ours = mapper.readTree(
        ChallengeReporting.planJson(qid, plans(qid)))
      val ref = mapper.readTree(golden(s"plans/$stub.plan.json"))
      assert(ours == ref, s"plan JSON mismatch for $qid")
    }
  }

  test("writeArtifacts produces the three sink files") {
    val dir = Files.createTempDirectory("graft_challenge_out")
    ChallengeReporting.writeArtifacts(dir.toString)
    assert(Files.exists(dir.resolve("leaderboard.md")))
    assert(Files.exists(dir.resolve("results.csv")))
    val plansDir = dir.resolve("plans")
    assert(Files.list(plansDir).iterator().asScala.size == 2)
    assert(Files.readString(dir.resolve("leaderboard.md")) == golden("leaderboard.md"))
  }
}
