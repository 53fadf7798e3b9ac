package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all Spark suites (startup is ~8s). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** All messages down a throwable's cause chain — Spark wraps executor
    * raise_error failures several layers deep, so guard specs search the
    * whole chain for the operator's message. */
  def causeMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ causeMessages(x.getCause))
}
