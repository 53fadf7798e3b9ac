package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Stats

class StatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def bruteQuantile(vs: Seq[Long], p: Double): Long = {
    val sorted = vs.sorted
    sorted(math.ceil(p * vs.size).toInt - 1) // 1-based lower rank
  }

  test("exactQuantiles == brute-force lower-rank selection on the documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val byLang = docs.select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq.groupBy(_._1)
    val out = Stats.exactQuantiles(docs, "lang", "n_chars").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out.keySet == byLang.keySet)
    byLang.foreach { case (lang, rows) =>
      val vs = rows.map(_._2)
      val r = out(lang)
      assert(r.getAs[Long]("n") == vs.size)
      assert(r.getAs[Long]("p50") == bruteQuantile(vs, 0.5), s"$lang p50")
      assert(r.getAs[Long]("p90") == bruteQuantile(vs, 0.9), s"$lang p90")
      assert(r.getAs[Long]("p99") == bruteQuantile(vs, 0.99), s"$lang p99")
    }
  }

  test("edge cases: single value, heavy ties, p=1.0, null rows excluded") {
    val df = Seq(
      ("a", Some(5L)), ("a", Some(5L)), ("a", Some(5L)),     // all ties
      ("b", Some(1L)), ("b", Some(2L)), ("b", Some(100L)),
      ("b", None), (null, Some(9L))                          // null value/group dropped
    ).toDF("g", "v")
    val out = Stats.exactQuantiles(df, "g", "v", Seq(0.5, 1.0))
      .orderBy("g").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a" && out(0).getAs[Long]("n") == 3L &&
      out(0).getAs[Long]("p50") == 5L && out(0).getAs[Long]("p100") == 5L)
    assert(out(1).getString(0) == "b" && out(1).getAs[Long]("n") == 3L &&
      out(1).getAs[Long]("p50") == 2L && out(1).getAs[Long]("p100") == 100L)
  }

  test("partitioning-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) = Stats.exactQuantiles(docs.repartition(parts), "lang", "n_chars")
      .orderBy("g").collect().map(_.toString).toSeq
    assert(run(2) == run(13))
  }
}
