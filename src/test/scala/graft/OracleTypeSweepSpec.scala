package graft

import org.scalatest.funsuite.AnyFunSuite

import scala.sys.process.{Process, ProcessLogger}

/** STANDING oracle type-sweep gate (round-10 verdict item 5): DuckDB
  * widens integer aggregates to HUGEINT/INT128, which Spark cannot emit
  * — rows and schema still "match" but the value hash doesn't (the
  * round-9 `rolling_7d_metrics` bug class). `tools/check_oracle_types
  * .py` DESCRIBEs every registered oracle against the sf0.01 tables and
  * fails on any HUGEINT/INT128 output column; this spec makes `sbt
  * test` run it, so an un-cast aggregate is caught at build time
  * instead of by a red CORRECTNESS row a round later.
  *
  * Needs the driver-side python stack (python3 + duckdb) and the
  * generated testdata — both contractual in this sandbox; the spec
  * cancels (not fails) where they are absent so the suite stays
  * portable. No SparkSession is needed: the oracle registry is dumped
  * straight from [[SparkEntry.oracleSql]]. */
class OracleTypeSweepSpec extends AnyFunSuite {
  test("every registered oracle DESCRIBEs clean of HUGEINT/INT128") {
    val sfDir = "/root/testdata/sf0.01"
    assume(new java.io.File(sfDir).isDirectory, s"no testdata at $sfDir")
    val probe = Process(Seq("python3", "-c", "import duckdb"))
      .!(ProcessLogger(_ => (), _ => ()))
    assume(probe == 0, "python3+duckdb unavailable")
    val tool = new java.io.File("tools/check_oracle_types.py")
    assume(tool.isFile, s"missing ${tool.getPath} (cwd=${new java.io.File(".").getCanonicalPath})")

    val outDir = java.nio.file.Files.createTempDirectory("oracle_sweep")
    java.nio.file.Files.writeString(
      outDir.resolve("oracle_sql.json"), Verify.oracleSqlJson)
    val out = new StringBuilder
    val rc = Process(Seq("python3", tool.getPath, sfDir, outDir.toString))
      .!(ProcessLogger(l => out.append(l).append('\n'),
        l => out.append(l).append('\n')))
    info(s"[oracle-types] ${out.toString.trim}")
    assert(rc == 0,
      s"oracle type sweep failed (${SparkEntry.oracleSql.size} oracles):\n$out")
  }
}
