package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session once (JVM + codegen + parquet footer reads) so the
    // per-query numbers measure the queries, not first-touch startup.
    spark.range(1000).selectExpr("sum(id)").collect()
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).limit(1).count())
    // Deterministic name order (Map iteration order shifts when queries are
    // added, skewing cross-round comparisons), and cache isolation: several
    // dedup queries persist intermediates, and leftover cached blocks put
    // later queries under memory/GC pressure (measured 3-10x inflation).
    //
    // min-of-2 per query: single-shot timing at this SF has run-to-run
    // variance comparable to the round-over-round deltas being compared
    // (VERDICT r2 — builder's 54.9 s vs driver's 78.2 s for the same suite),
    // so each query runs twice and reports the min, which strips the
    // GC/JIT-recompilation tail without hiding steady-state cost.
    //
    // Failures are surfaced, not swallowed: an erroring query is excluded
    // from the total and listed under "errors" (a -1 timing previously read
    // as a fast success).
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      val r = try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case e: Throwable =>
          val msg = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.next().take(200)
          System.err.println(s"[bench] $name FAILED: $msg")
          errors(name) = msg
          None
        }
      spark.catalog.clearCache()
      r
    }
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      once(name, fn).foreach { t1 =>
        val t = math.min(t1, once(name, fn).getOrElse(t1))
        if (!errors.contains(name)) timings(name) = t
      }
    }
    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    val qs = timings.map { case (k, v) => jq(k) + ":" + v }.mkString("{", ",", "}")
    val es = errors.map { case (k, v) => jq(k) + ":" + jq(v) }.mkString("{", ",", "}")
    val total = timings.values.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$es,"failed":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
