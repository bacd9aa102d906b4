package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for graft's custom Catalyst expressions, so the pure-SQL
  * surface (spark.sql / GraftCatalog users) can reach them too:
  *
  * {{{
  *   GraftFunctions.register(spark)
  *   spark.sql("SELECT sorted_intersect_count(a.set, b.set) FROM ...")
  * }}}
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => SortedIntersectCount(exprs(0), exprs(1)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "graft_cosine",
      exprs => CosineSim(exprs(0), exprs(1)),
      "built-in")
  }

  /** [[register]] that never clobbers an existing registration — the
    * catalog's table-resolution path calls this, so a user's own
    * same-named temp function survives (an explicit `register` call is
    * the override). */
  def registerIfAbsent(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    def absent(n: String) = !reg.functionExists(
      org.apache.spark.sql.catalyst.FunctionIdentifier(n))
    if (absent("sorted_intersect_count"))
      reg.createOrReplaceTempFunction(
        "sorted_intersect_count",
        exprs => SortedIntersectCount(exprs(0), exprs(1)),
        "built-in")
    if (absent("graft_cosine"))
      reg.createOrReplaceTempFunction(
        "graft_cosine",
        exprs => CosineSim(exprs(0), exprs(1)),
        "built-in")
  }
}
