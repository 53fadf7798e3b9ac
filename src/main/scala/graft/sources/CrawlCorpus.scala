package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.pdf.Fixtures

/** One Common-Crawl-style page row, exactly the input shape from
  * BASELINE.json `input_hint`:
  * (url string, warc_ts timestamp, html binary, text string, lang string).
  */
final case class CrawlRow(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String
)

/** Deterministic synthesized crawl corpus: the reference's 36 fixture PDFs
  * (replicated with distinct urls) interleaved with generated HTML pages.
  * Seeded splitmix64 per row id — identical output for any partitioning,
  * any parallelism, any JVM. Generation happens inside mapPartitions over
  * spark.range, so the corpus scales without ever materializing on the
  * driver.
  */
object CrawlCorpus {

  val BaseTsMillis: Long = 1577836800000L // 2020-01-01T00:00:00Z

  private val Langs = Array("en", "de", "es", "fr", "zh", "ja", "ru", "pt")

  private val Words: Array[String] = Array(
    "data", "pipeline", "crawl", "extract", "content", "page", "text",
    "parser", "stream", "filter", "object", "document", "spark", "scale",
    "shuffle", "partition", "column", "binary", "table", "query", "batch",
    "token", "corpus", "sample", "record", "schema", "value", "index",
    "offset", "buffer", "cluster", "executor", "metric", "lineage", "commit",
    "resume", "anchor", "heading", "article", "footer")

  @inline def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Deterministic stateless rng stream: k-th draw for row id. */
  @inline private def draw(seed: Long, id: Long, k: Long): Long =
    splitmix64(splitmix64(seed ^ (id * 0x100000001b3L)) ^ k)

  @inline private def pick[T](arr: Array[T], r: Long): T =
    arr(((r % arr.length) + arr.length).toInt % arr.length)

  /** Build one row. Even ids carry a fixture PDF payload; odd ids carry a
    * generated HTML page. `htmlScale` multiplies the page body size
    * (1 ~ 1.5 KB; 20 ~ 30 KB, a realistic crawl page). */
  def row(id: Long, seed: Long, htmlScale: Int = 1): CrawlRow = {
    val lang = pick(Langs, draw(seed, id, 1))
    val ts = new Timestamp(BaseTsMillis + (id % 86400L) * 1000L + id / 86400L)
    if (id % 2 == 0) {
      val fi = ((id / 2) % Fixtures.names.length).toInt
      val name = Fixtures.names(fi)
      CrawlRow(
        url = s"test://crawl/$id/$name",
        warc_ts = ts,
        html = Fixtures.all(fi)._2,
        text = "",
        lang = lang)
    } else {
      CrawlRow(
        url = s"test://crawl/$id/page.html",
        warc_ts = ts,
        html = genHtml(id, seed, htmlScale).getBytes("UTF-8"),
        text = "",
        lang = lang)
    }
  }

  /** Deterministic HTML page: head + nav link cluster (boilerplate), a main
    * article of several paragraphs, a table, a footer link cluster. */
  def genHtml(id: Long, seed: Long, htmlScale: Int = 1): String = {
    val sb = new StringBuilder
    def w(k: Long): String = pick(Words, draw(seed, id, k))
    sb ++= "<!DOCTYPE html><html><head><title>" ++= w(2) ++= " " ++= w(3)
    sb ++= "</title><script>var x = 'not content';</script>"
    sb ++= "<style>.a{color:red}</style></head><body>"
    sb ++= "<nav><a href=\"/\">home</a> <a href=\"/a\">" ++= w(4)
    sb ++= "</a> <a href=\"/b\">" ++= w(5) ++= "</a></nav>"
    sb ++= "<article><h1>" ++= w(6) ++= " " ++= w(7) ++= "</h1>"
    val nParas = (3 + (math.abs(draw(seed, id, 8)) % 5).toInt) * math.max(htmlScale, 1)
    var p = 0
    while (p < nParas) {
      sb ++= "<p>"
      val nWords = 15 + (math.abs(draw(seed, id, 100 + p)) % 40).toInt
      var k = 0
      while (k < nWords) {
        if (k > 0) sb += ' '
        sb ++= w(1000L + p * 101L + k)
        k += 1
      }
      sb ++= " &amp; " ++= w(1000L + p * 101L + nWords) ++= ".</p>"
      p += 1
    }
    sb ++= "<table><tr><td>" ++= w(9) ++= "</td><td>" ++= w(10)
    sb ++= "</td></tr></table></article>"
    sb ++= "<footer><a href=\"/c\">" ++= w(11) ++= "</a> <a href=\"/d\">"
    sb ++= w(12) ++= "</a></footer></body></html>"
    sb.toString
  }

  /** The corpus as a typed Dataset, generated distributed. */
  def crawl(spark: SparkSession, nDocs: Long, seed: Long = 42L,
            numPartitions: Int = 0, htmlScale: Int = 1): Dataset[CrawlRow] = {
    import spark.implicits._
    val parts = if (numPartitions > 0) numPartitions
                else spark.sparkContext.defaultParallelism
    spark.range(0, nDocs, 1, parts).mapPartitions { it =>
      it.map(id => row(id, seed, htmlScale))
    }
  }
}
