package graft.queries

import org.apache.spark.sql.SparkSession

/** Query CLI over the pipeline's output collections — the LINK/ES query
  * surface as a runnable artifact (SURVEY §3.3).
  *
  * {{{
  * runMain graft.queries.QueryMain <collectionsDir> sql "SELECT ..."
  * runMain graft.queries.QueryMain <collectionsDir> cooccur ENT1 ENT2 [...]
  * runMain graft.queries.QueryMain <collectionsDir> search "query terms"
  * }}}
  */
object QueryMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryMain <collectionsDir> <sql|cooccur|search> ...")
    val dir = args(0)
    val mode = args(1)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .appName("graft-query")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SearchFacade.registerTables(spark, dir)

    val result = mode match {
      case "sql" =>
        spark.sql(args(2))
      case "cooccur" =>
        SearchFacade.coOccurrence(spark.table("concept"), args.drop(2).toSeq)
      case "search" =>
        import org.apache.spark.sql.functions._
        val pubs = SearchFacade.withSearchTokens(
          spark.table("publication"), "abstract")
        pubs.filter(SearchFacade.matchAll(col("tokens"), args(2)))
          .select(col("pub_id"), col("title"))
      case other => sys.error(s"unknown mode: $other")
    }
    result.limit(100).toJSON.collect().foreach(println)
    spark.stop()
  }
}
