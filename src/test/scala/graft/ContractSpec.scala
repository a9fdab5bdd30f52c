package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants (no Spark session needed): the correctness
  * gate hash-compares `SparkEntry.queries` against `SparkEntry.oracleSql`
  * by NAME, so a key drift between the two maps silently downgrades a
  * query to a rows-only check — exactly the kind of regression a
  * rename slips in. */
class ContractSpec extends AnyFunSuite {

  test("every registered query has an oracle and vice versa") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o.diff(q)}")
    assert(q.subsetOf(o), s"queries without oracles: ${q.diff(o)}")
  }

  test("pipeline phases reference registered queries only") {
    val q = SparkEntry.queries.keySet
    val dag = (Pipeline.phases ++ Pipeline.curationPhases).flatMap(_._2)
    assert(dag.nonEmpty)
    dag.foreach(n => assert(q.contains(n), s"unknown pipeline query: $n"))
  }

  test("oracle SQL is non-empty and targets the shared tables") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql.trim.nonEmpty, s"empty oracle for $name")
      assert(sql.toUpperCase.contains("SELECT"), s"no SELECT in $name")
    }
  }
}
