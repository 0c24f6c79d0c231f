package graft
/** Temporary plan-audit main (not part of the library surface). */
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = MainCommon.session("explain")
    val e = new graft.query.QueryEngine(spark, args(0), args(1).toInt)
    val plan = e.postingsFor(Seq("w00017", "w00342"))
      .queryExecution.executedPlan.toString
    plan.split("\n").filter(l => l.contains("PartitionFilters") ||
      l.contains("PushedFilters") || l.contains("ReadSchema"))
      .foreach(l => println("[plan] " + l.trim.take(1200)))
    spark.stop()
  }
}
