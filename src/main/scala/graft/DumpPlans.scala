package graft

import org.apache.spark.sql.SparkSession

/** Scratch main: dump formatted physical plans for PLANS.md. */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(s"## $name")
      println()
      println("```")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .map(_.take(150)).mkString("\n"))
      println("```")
      println()
    }
    spark.stop()
  }
}
