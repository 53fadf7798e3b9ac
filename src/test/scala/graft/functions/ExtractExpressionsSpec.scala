package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.SparkTestBase
import graft.pdf.Fixtures

/** SQL-surface parity: the native Catalyst expressions must produce exactly
  * what the typed pipeline produces, from SQL text, inside codegen. */
class ExtractExpressionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("pdf_text in SQL equals the kernel output byte-for-byte") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq(("xref_repair.pdf", Fixtures.bytes("xref_repair.pdf")))
      .toDF("name", "payload").createOrReplaceTempView("pdfs")
    val row = spark.sql("SELECT pdf_text(payload) AS t FROM pdfs").collect()(0)
    assert(new String(row.getAs[Array[Byte]]("t"), ISO_8859_1) == "Hello World\n")
  }

  test("graft_text routes pdf vs html and html_text strips boilerplate") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val html = "<html><head><script>x</script></head><body><p>real content here</p></body></html>"
    Seq(
      ("test://a/doc.pdf", Fixtures.bytes("xref_repair.pdf")),
      ("test://b/page.html", html.getBytes("UTF-8")))
      .toDF("url", "payload").createOrReplaceTempView("pages")
    val rows = spark.sql(
      "SELECT url, decode(graft_text(url, payload), 'UTF-8') AS t FROM pages ORDER BY url")
      .collect()
    assert(rows(0).getString(1) == "Hello World\n")
    assert(rows(1).getString(1) == "real content here")
    val h = spark.sql("SELECT decode(html_text(payload), 'UTF-8') AS t FROM pages WHERE url LIKE '%html'").collect()
    assert(h(0).getString(0) == "real content here")
  }

  test("null payload yields null, wrong type fails analysis") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT pdf_text(CAST(NULL AS BINARY)) AS t").collect()
    assert(r(0).isNullAt(0))
    val err = intercept[Exception] {
      spark.sql("SELECT pdf_text('not binary')").collect()
    }
    assert(err.getMessage.toLowerCase.contains("binary") || err.getMessage.contains("DATATYPE"))
  }
}
