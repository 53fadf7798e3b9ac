package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Vocab

class VocabSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a b a c b a"),     // a:3 b:2 c:1
    (2L, "b c  d"),          // b:1 c:1 d:1 (double space -> empty dropped)
    (3L, null.asInstanceOf[String]),
    (4L, "")
  ).toDF("doc_id", "text")

  test("build: counts, minCnt cut, vocabSize cut, dense ids from 1") {
    // corpus counts: a:4? no — a:3, b:3, c:2, d:1
    val all = Vocab.build(docs, "doc_id", "text", vocabSize = 10)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toList
    // rank: cnt desc, token asc — a(3) before b(3) on the tie
    assert(all == List((1L, "a", 3L), (2L, "b", 3L), (3L, "c", 2L), (4L, "d", 1L)))
    // minCnt drops the hapax BEFORE ranking
    val cut = Vocab.build(docs, "doc_id", "text", vocabSize = 10, minCnt = 2)
      .collect().map(_.getString(1)).toList
    assert(cut == List("a", "b", "c"))
    // vocabSize keeps the TOP of the ranking
    val top2 = Vocab.build(docs, "doc_id", "text", vocabSize = 2)
      .collect().map(r => (r.getLong(0), r.getString(1))).toList
    assert(top2 == List((1L, "a"), (2L, "b")))
  }

  test("encode: in-order ids, OOV -> 0, null/empty text -> (0, NULL)") {
    val vocab = Vocab.build(docs, "doc_id", "text", vocabSize = 2) // a=1 b=2
    val out = Vocab.encode(docs, "doc_id", "text", vocab)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.getSeq[Long](2)).map(_.toList)))).toMap
    assert(out(1L) == ((6L, Some(List(1L, 2L, 1L, 0L, 2L, 1L)))))
    assert(out(2L) == ((3L, Some(List(2L, 0L, 0L)))))
    assert(out(3L) == ((0L, None)))
    assert(out(4L) == ((0L, None)))
  }

  test("encode: custom oovId and external vocab frames work") {
    val vocab = Seq((7L, "d")).toDF("vid", "token")
    val out = Vocab.encode(docs, "doc_id", "text", vocab, oovId = -1L)
      .where(col("id") === 2L)
      .collect().map(r => r.getSeq[Long](2).toList).head
    assert(out == List(-1L, -1L, 7L))
  }

  test("encode: duplicate ids raise") {
    val dup = Seq((1L, "a"), (1L, "b")).toDF("doc_id", "text")
    val vocab = Vocab.build(docs, "doc_id", "text", vocabSize = 2)
    val e = intercept[Exception] {
      Vocab.encode(dup, "doc_id", "text", vocab).collect()
    }
    assert(e.getMessage.contains("Vocab.encode"))
  }

  test("build/encode: stable under repartitioning (dataset-freeze property)") {
    val base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val v1 = Vocab.build(base, "doc_id", "text", vocabSize = 20, minCnt = 2)
    val v2 = Vocab.build(base.repartition(13), "doc_id", "text", vocabSize = 20, minCnt = 2)
    assert(v1.collect().toSeq == v2.collect().toSeq)
    val e1 = Vocab.encode(base, "doc_id", "text", v1)
      .orderBy("id").collect().toSeq
    val e2 = Vocab.encode(base.repartition(7), "doc_id", "text", v2)
      .orderBy("id").collect().toSeq
    assert(e1 == e2)
  }
}
