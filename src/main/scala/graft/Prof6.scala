package graft

import org.apache.spark.sql.SparkSession

/** Scratch: t01 plan dump — how many times does the split/concat chain
  * get inlined into the physical plan?
  */
object Prof6 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.tune(spark)
    val df = graft.operators.TickQueries.queries("t01_tick_parse")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    System.err.println(plan.take(12000))
    def count(needle: String): Int =
      plan.sliding(needle.length).count(_ == needle)
    System.err.println(s"[prof6] split( occurrences: ${count("split(")}")
    System.err.println(s"[prof6] concat( occurrences: ${count("concat(")}")
    System.err.println(s"[prof6] ascii( occurrences: ${count("ascii(")}")
    spark.stop()
  }
}
