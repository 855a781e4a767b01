package graft
import org.apache.spark.sql.SparkSession

/** Drives the driver contract end-to-end: SparkEntry.entry rows>0 plus a
  * schema/row-count dump — the same smoke the round driver runs.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    df.printSchema()
    println(s"[smoke] entry rows = ${df.count()}")
    df.show(5, truncate = false)
    spark.stop()
  }
}
