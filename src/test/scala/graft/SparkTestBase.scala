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

  /** Run `f` with the SparkContext checkpoint dir set to a fresh temp dir,
    * then restore. A checkpoint dir cannot be UNSET on a live context, so
    * when none was set before, restore points at this stable session-wide
    * fallback instead of the test's own (about-to-vanish) directory —
    * deterministic state regardless of suite ordering. */
  lazy val fallbackCheckpointDir: String =
    java.nio.file.Files.createTempDirectory("graft_ckpt_fallback").toString
  def withCheckpointDir[T](f: => T): T = {
    val sc = spark.sparkContext
    val prev = sc.getCheckpointDir
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt")
    sc.setCheckpointDir(dir.toString)
    try f
    finally {
      sc.setCheckpointDir(prev.getOrElse(fallbackCheckpointDir))
      // the checkpointed RDD data is only needed while f runs — reclaim it
      try {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      } catch { case _: java.io.IOException => () }
    }
  }

  /** All messages down a throwable's cause chain — Spark wraps executor
    * raise_error failures several layers deep, so guard specs search the
    * whole chain for the operator's message. */
  def causeMessages(t: Throwable): Seq[String] =
    Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ causeMessages(x.getCause))
}
