package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench's quadratic-twin exclusion list (no Spark session
  * needed — pure audits over the constant, the query registry, and
  * the ladder script):
  *
  *  - every annotated twin is a REAL query (a rename would silently
  *    un-exclude it: Bench's skip filter matches by name);
  *  - the newest ladder script's SPARK_GRAFT_BENCH_SKIP equals the
  *    annotation set EXACTLY — a future query cannot join the
  *    exclusion list without also joining
  *    [[Bench.QuadraticTruthTwins]] (whose scaladoc demands the
  *    documented-quadratic justification), and a twin cannot silently
  *    drop out of the ladder either.
  */
class BenchAuditSpec extends AnyFunSuite {

  test("every annotated quadratic twin is a registered query") {
    val keys = SparkEntry.queries.keySet
    val ghosts = Bench.QuadraticTruthTwins -- keys
    assert(ghosts.isEmpty,
      s"annotated twins with no query: ${ghosts.toSeq.sorted.mkString(", ")}")
  }

  test("the newest ladder script's exclusion list == the annotation " +
    "set exactly") {
    val dir = new java.io.File("scripts")
    val scripts = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("run_ladder_r\\d+\\.sh"))
      .sortBy(f => f.getName.replaceAll("\\D", "").toInt)
    assert(scripts.nonEmpty, "no ladder scripts found under scripts/")
    val newest = scripts.last
    val line = scala.io.Source.fromFile(newest).getLines()
      .find(_.startsWith("export SPARK_GRAFT_BENCH_SKIP="))
      .getOrElse(fail(s"${newest.getName} sets no SPARK_GRAFT_BENCH_SKIP"))
    val scripted = line.stripPrefix("export SPARK_GRAFT_BENCH_SKIP=")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
    assert(scripted == Bench.QuadraticTruthTwins,
      s"ladder exclusion list drifted from Bench.QuadraticTruthTwins:\n" +
        s"  script:    ${scripted.toSeq.sorted.mkString(", ")}\n" +
        s"  annotated: ${Bench.QuadraticTruthTwins.toSeq.sorted.mkString(", ")}")
  }
}
