package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.ExtractPipeline
import graft.sources.CrawlCorpus

/** Bucketed-table co-located join: at 10^12 documents the resume anti-join
  * and any url-keyed enrichment join must not shuffle the fact side. Writing
  * both sides bucketed by url makes the join exchange-free — asserted on the
  * physical plan, not assumed.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("url-bucketed tables join without any Exchange") {
    import spark.implicits._

    val docs = ExtractPipeline.extractDocs(CrawlCorpus.crawl(spark, 60, 42L)).toDF()
      .select(col("url"), col("kind"), col("ok"), length(col("contents")).as("n_bytes"))
    val committed = CrawlCorpus.crawl(spark, 40, 42L).toDF().select(col("url"))

    docs.write.mode("overwrite").format("parquet")
      .bucketBy(8, "url").sortBy("url").saveAsTable("docs_bucketed")
    committed.write.mode("overwrite").format("parquet")
      .bucketBy(8, "url").sortBy("url").saveAsTable("committed_bucketed")

    // disable broadcast so the planner must pick the bucketed sort-merge
    // path (at test scale everything broadcasts, which hides bucketing)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("docs_bucketed")
        .join(spark.table("committed_bucketed"), Seq("url"), "left_anti")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(plan.contains("Bucketed: true"), plan)

      // and it is still correct: 60 - 40 pending urls
      assert(joined.count() == 20)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    spark.sql("DROP TABLE IF EXISTS docs_bucketed")
    spark.sql("DROP TABLE IF EXISTS committed_bucketed")
  }
}
