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

  test("distinct-value cap raise_errors on a near-continuous column, naming the group") {
    val df = (1L to 500L).map(i => ("hot", i * 1000003L)).toDF("g", "v")
    val e = intercept[Exception] {
      Stats.exactQuantiles(df, "g", "v", maxDistinctValuesPerGroup = 100L).collect()
    }
    val msg = SparkTestBase.causeMessages(e).mkString("\n")
    assert(msg.contains("exactQuantiles") && msg.contains("hot") && msg.contains("500"))
  }

  test("valueResolution quantizes to floor multiples (negatives included) and un-trips the cap") {
    val df = ((1L to 500L).map(i => ("hot", i)) ++ Seq(("neg", -7L), ("neg", -3L), ("neg", 4L)))
      .toDF("g", "v")
    val out = Stats.exactQuantiles(df, "g", "v", Seq(0.5, 1.0),
        valueResolution = 10L, maxDistinctValuesPerGroup = 100L)
      .orderBy("g").collect()
    // hot: 500 values quantize to 51 buckets (0,10,...,500) — under the cap
    val hot = out(0)
    def floorQ(v: Long) = v - ((v % 10 + 10) % 10)
    val hotVs = (1L to 500L).map(floorQ).sorted
    assert(hot.getAs[Long]("n") == 500L)
    assert(hot.getAs[Long]("p50") == hotVs(math.ceil(0.5 * 500).toInt - 1))
    assert(hot.getAs[Long]("p100") == hotVs.last)
    // negatives floor toward -inf: -7 -> -10, -3 -> -10, 4 -> 0
    val neg = out(1)
    assert(neg.getAs[Long]("p50") == -10L && neg.getAs[Long]("p100") == 0L)
  }

  test("max_distinct_values_per_group observed metric rides the run") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Stats.exactQuantiles(docs, "lang", "n_chars")
    val expectNdv = docs.select("lang", "n_chars").where($"n_chars".isNotNull && $"lang".isNotNull)
      .distinct().groupBy("lang").count().agg(max("count")).head().getLong(0)
    out.collect()
    val metrics = out.queryExecution.observedMetrics
      .collect { case (k, v) if k.startsWith("exact_quantiles_") => v }
    assert(metrics.nonEmpty, s"no exact_quantiles metric in ${out.queryExecution.observedMetrics.keys}")
    assert(metrics.head.getAs[Long]("max_distinct_values_per_group") == expectNdv)
  }

  test("partitioning-independent") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def run(parts: Int) = Stats.exactQuantiles(docs.repartition(parts), "lang", "n_chars")
      .orderBy("g").collect().map(_.toString).toSeq
    assert(run(2) == run(13))
  }
}
