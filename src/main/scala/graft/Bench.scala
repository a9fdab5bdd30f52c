package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every registered query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line. Failed queries are reported in a `failed` map (name
  * → error) and count 0 toward the total — a failure must never masquerade
  * as a fast run (round-3 lesson: broken queries "ran" in 0.06 s).
  * The line is also written to bench_line.json so the signal survives any
  * log-prefix mangling by the build tool. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def esc(s: String): String =
      s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      }
    val times = scala.collection.mutable.LinkedHashMap[String, Double]()
    val failed = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        times(name) = (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        failed(name) = s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        System.err.println(s"[bench] FAILED $name: ${failed(name)}")
      } finally spark.catalog.clearCache()
    }
    val qs = times.map { case (k, v) => s""""${esc(k)}":$v""" }
      .mkString("{", ",", "}")
    val fs = failed.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
      .mkString("{", ",", "}")
    val total = times.values.sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fs,"sf":"${esc(sfDir)}"}"""
    println(line)
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_line.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
