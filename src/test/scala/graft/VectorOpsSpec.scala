package graft

import graft.operators.VectorOps

/** Vector-operator boundary tests. The oracle harness already
  * hash-checks every registered vector query on the real testdata; this
  * suite covers the degenerate geometry the testdata cannot produce —
  * a corpus whose vectors all land in ONE IVF cell. */
class VectorOpsSpec extends GraftSpec {
  import spark.implicits._

  test("IVF cell cap bounds a degenerately clustered corpus") {
    // 300 IDENTICAL vectors: every centroid is the same point, so the
    // argmin tiebreak (lowest cent_id) assigns the whole corpus to one
    // cell — m = 300 ≫ √N ≈ 18, the exact skew case the cap guards.
    val n = 300
    assert(n > VectorOps.CellCap, "fixture must overflow the cap")
    val v = Array.tabulate(VectorOps.Dim)(j => (j % 7 + 1).toFloat)
    val rows = (0 until n).map(i => (i.toLong, v, 0))
    writeTable("embeddings", rows.toDF("vec_id", "embedding", "label"))

    val out = VectorOps.annIvfTop1(spark, scratch).collect()

    // Every vector still queries (the cap never costs query coverage),
    // but candidates come only from the capped membership — the
    // candidate stage did at most n·NProbe·cap pair dots instead of
    // n·(n−1) ≈ 90k.
    assert(out.length == n, s"expected $n query rows, got ${out.length}")
    assert(out.forall(_.getAs[Long]("cent_id") == 0L),
      "all vectors should share the single degenerate cell")
    // Identical vectors → all cosines 1; tiebreak picks the lowest
    // other id within the CAPPED membership (ids 0..cap-1).
    out.foreach { r =>
      val q = r.getAs[Long]("q_id")
      val c = r.getAs[Long]("c_id")
      assert(c < VectorOps.CellCap, s"uncapped candidate $c for q=$q")
      assert(c == (if (q == 0L) 1L else 0L), s"q=$q picked c=$c")
      assert(r.getAs[Double]("cosine") > 0.999)
    }
    assert(out.map(_.getAs[Long]("q_id")).toSet ==
      (0L until n.toLong).toSet)
  }
}
