package graft.costs

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

/** Byte-golden suite for the homework report sinks: the goldens are the
  * ACTUAL stdout of the reference CLI this session (`main.py --db DB1`
  * and `--json`). Byte equality covers the float formatting too —
  * [[PyFormat]] renders doubles exactly like CPython's repr. */
class HomeworkReportSpec extends AnyFunSuite {

  private def golden(name: String): String =
    new String(
      getClass.getResourceAsStream(s"/homework_golden/$name").readAllBytes(),
      StandardCharsets.UTF_8)

  test("text report is byte-identical to the reference CLI output") {
    assert(HomeworkReport.textReport() + "\n" == golden("hw_report.txt"))
  }

  test("--json report is byte-identical to the reference CLI output") {
    val ours = HomeworkReport.jsonReport(HomeworkSim.simulateQueries())
    assert(ours + "\n" == golden("hw_report.json"))
  }

  test("--db DB2..DB5 reports are byte-identical to the DB1 golden") {
    // reference `config.py:86-91`: one sizing table shared by all five
    // signatures, so every --db choice prints the same bytes
    for (sig <- HomeworkSim.dbSignatures.drop(1))
      assert(HomeworkReport.textReport(sig) + "\n" == golden("hw_report.txt"),
        s"report for $sig diverged from the DB1 golden")
  }

  test("unknown --db signature falls back to 0-GB collections with warnings") {
    // reference `config.py:96-103`: .get(db_signature, {}) → 0.0 sizes;
    // costs.py:75-76 then appends the warning note per component
    val results = HomeworkSim.simulateQueries(dbSignature = "DB99")
    assert(results.nonEmpty)
    for {
      r <- results
      (_, cost) <- r.componentCosts
    } {
      assert(cost.dataScannedGb == 0.0)
      assert(cost.notes.contains("Warning: collection size not found, using 0 GB"))
    }
  }

  test("chapter5 full report is byte-identical to the reference CLI output") {
    assert(Chapter5Report.fullReport() == golden("ch5_report.txt"))
  }

  test("pyFloat matches CPython repr across formatting regimes") {
    assert(PyFormat.pyFloat(0.0) == "0.0")
    assert(PyFormat.pyFloat(5.0) == "5.0")
    assert(PyFormat.pyFloat(-2.5) == "-2.5")
    assert(PyFormat.pyFloat(0.0001) == "0.0001")
    assert(PyFormat.pyFloat(0.00001) == "1e-05")
    assert(PyFormat.pyFloat(2.7939677238464355e-08) == "2.7939677238464355e-08")
    assert(PyFormat.pyFloat(1e16) == "1e+16")
    assert(PyFormat.pyFloat(1.5e16) == "1.5e+16")
    assert(PyFormat.pyFloat(9999999999999998.0) == "9999999999999998.0")
    assert(PyFormat.pyFloat(76.5496690496037) == "76.5496690496037")
    assert(PyFormat.pyFloat(1221.8952484428883) == "1221.8952484428883")
  }
}
