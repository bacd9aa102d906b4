package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.TableStore

/** Where does the time-chunked dashboard's latency go at 1,500 files?
  * Separates commit / analyze / FIRST plan / SECOND plan (memo-warm) /
  * execution so planning-cost regressions are attributable. */
object GroupExprProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"[prof] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val root = graft.util.Scratch.dir("gexpr_prof")
    val store = new TableStore(spark, root)
    val nFiles = 1500
    timed("commit") {
      store.commitSnapshot(spark.range(0, nFiles.toLong * 400)
        .select(timestamp_seconds(lit(1577836800L) +
          ($"id" / 400).cast("long") * 86400L + ($"id" % 400) * 216L).as("ts"),
          ($"id" % 97).as("v"))
        .repartitionByRange(nFiles, $"ts"))
    }
    timed("analyze") { store.analyze() }
    val w = new java.io.File(root).getParent
    spark.conf.set("spark.sql.catalog.gp_cat",
      classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.gp_cat.warehouse", w)
    val tbl = s"gp_cat.`${new java.io.File(root).getName}`"
    val q = s"SELECT date_trunc('month', ts) AS mon, COUNT(*) AS n, " +
      s"SUM(v) AS sv FROM $tbl GROUP BY 1 ORDER BY mon"
    timed("plan 1 (cold)") {
      spark.sql(q).queryExecution.optimizedPlan
    }
    timed("plan 2 (memo-warm)") {
      spark.sql(q).queryExecution.optimizedPlan
    }
    // sample the planning thread to attribute the per-pass cost
    locally {
      val main = Thread.currentThread()
      val counts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
      @volatile var stop = false
      val sampler = new Thread(() => {
        while (!stop) {
          val st = main.getStackTrace
          // first graft/spark frame below the sql entry
          st.find(f => f.getClassName.startsWith("graft.") ||
              f.getClassName.contains("datasources") ||
              f.getClassName.contains("execution")).foreach { f =>
            val k = f.getClassName + "." + f.getMethodName
            counts.merge(k, 1, (a, b) => a + b)
          }
          Thread.sleep(20)
        }
      })
      sampler.setDaemon(true); sampler.start()
      spark.sql(q).queryExecution.optimizedPlan
      stop = true; sampler.join()
      import scala.jdk.CollectionConverters._
      counts.asScala.toSeq.sortBy(-_._2).take(12).foreach { case (k, n) =>
        println(s"[prof] sample $n  $k")
      }
    }
    timed("plan 3") {
      spark.sql(q).queryExecution.executedPlan
    }
    timed("execute (collect)") {
      val n = spark.sql(q).collect().length
      println(s"[prof] groups=$n")
    }
    timed("execute again") { spark.sql(q).collect() }
    spark.conf.set("spark.graft.agg.metadata.hybrid", "false")
    timed("plan, hybrid OFF") { spark.sql(q).queryExecution.optimizedPlan }
    spark.conf.unset("spark.graft.agg.metadata.hybrid")
    spark.conf.set("spark.graft.filter.monotoneRewrite", "false")
    timed("plan, monotone OFF (hybrid on)") {
      spark.sql(q).queryExecution.optimizedPlan
    }
    spark.conf.unset("spark.graft.filter.monotoneRewrite")
    // plain COUNT (no grouping): same table, is it also slow to plan?
    val q2 = s"SELECT COUNT(*) AS n FROM $tbl"
    timed("plan, plain COUNT") { spark.sql(q2).queryExecution.optimizedPlan }
    timed("exec, plain COUNT") { spark.sql(q2).collect() }
    spark.stop()
  }
}
