package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase
import graft.operators.Similarity

/** Parity: the native hyperplane-signature expression must equal the
  * declarative HOF formulation bit-for-bit on real embeddings. */
class LshExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  def emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")

  test("native hyperplane_sigs == declarative signatures on all embeddings") {
    for ((nBits, nTables) <- Seq((1, 4), (4, 2), (16, 8))) {
      val cmp = emb.select(
        Similarity.signaturesDeclarative(col("embedding"), nBits, nTables).as("a"),
        Similarity.signatures(col("embedding"), nBits, nTables).as("b"))
      assert(cmp.where(col("a") =!= col("b")).count() == 0, s"nBits=$nBits nTables=$nTables")
    }
  }

  test("double-typed vectors take the non-float path and agree too") {
    val d = emb.select(col("embedding").cast("array<double>").as("v"))
    val cmp = d.select(
      Similarity.signaturesDeclarative(col("v"), 8, 2).as("a"),
      Similarity.signatures(col("v"), 8, 2).as("b"))
    assert(cmp.where(col("a") =!= col("b")).count() == 0)
  }

  test("native cosine_sim == declarative dot/norm cosine, bit for bit, float and double") {
    val pairs = emb.select(col("vec_id").as("ia"), col("embedding").as("a"))
      .crossJoin(emb.select(col("vec_id").as("ib"), col("embedding").as("b")))
      .where(col("ia") < col("ib") && col("ib") < 40)
    val cmp = pairs.select(
      Similarity.cosineDeclarative(col("a"), col("b")).as("x"),
      Similarity.cosine(col("a"), col("b")).as("y"),
      Similarity.cosineDeclarative(col("a").cast("array<double>"), col("b")).as("xd"),
      Similarity.cosine(col("a").cast("array<double>"), col("b")).as("yd"))
    assert(cmp.where(col("x") =!= col("y") || col("xd") =!= col("yd")).count() == 0)
  }

  test("ragged and null-element inputs follow the declarative null semantics") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", ArrayType(DoubleType, containsNull = true)),
      StructField("b", ArrayType(DoubleType, containsNull = true))))
    val rows = java.util.Arrays.asList(
      Row(Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),      // ragged
      Row(Seq(1.0, null, 3.0), Seq(1.0, 2.0, 3.0)), // null element
      Row(Seq(1.0, 2.0), Seq(3.0, 4.0)))            // clean
    val df = spark.createDataFrame(rows, schema)
    val out = df.select(
      Similarity.cosine(col("a"), col("b")).as("nat"),
      Similarity.cosineDeclarative(col("a"), col("b")).as("dec"),
      Similarity.signatures(col("a"), 4, 2).as("sig_nat"),
      Similarity.signaturesDeclarative(col("a"), 4, 2).as("sig_dec")).collect()
    out.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), r.toString) // cosine null parity
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1), r.toString)
      assert(r.getSeq[Any](2) == r.getSeq[Any](3), r.toString) // signature parity
    }
    assert(out(0).isNullAt(0) && out(1).isNullAt(0) && !out(2).isNullAt(0))
  }

  test("plan stays native: no ScalaUDF, batched scan") {
    val p = emb.select(Similarity.signatures(col("embedding"), 8, 4).as("s"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("ScalaUDF"), p.take(1500))
    assert(p.contains("hyperplane_sigs"), p.take(1500))
  }
}
