package graft

import org.apache.spark.sql.SparkSession
import graft.operators.VectorOps

/** Diagnostic main (not a registered query): splits `ann_pq_top1` wall
  * time into its two halves — the PQ encode (train + encode + checkpoint)
  * and the full query (encode + coarse candidates + ADC scoring) — so
  * perf work aims at the half that actually dominates. Mirrors Bench's
  * methodology (noop sink, warmup + 3 timed runs). */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = Tables.embeddings(spark, sfDir).count()
    def time(label: String)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[pqprofile] $label%-14s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("encode") {
      VectorOps.pqEncode(spark, sfDir, n)
        .write.format("noop").mode("overwrite").save()
    }
    time("full_query") {
      VectorOps.annPqTop1(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
