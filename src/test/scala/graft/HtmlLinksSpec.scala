package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.HtmlLinks

/** Link-extraction kernel: href scanning rules, RFC-lite resolution,
  * totality on garbage, and the SQL-registered native expression. */
class HtmlLinksSpec extends AnyFunSuite {

  private def hrefs(html: String): Vector[String] =
    HtmlLinks.rawHrefs(html.getBytes("UTF-8"))

  test("rawHrefs: quoted, single-quoted, unquoted; order kept; duplicates kept") {
    val html =
      """<a href="/a">x</a><a href='/b'>y</a><a href=/c>z</a>
        |<a class="k" href="/a">again</a>""".stripMargin
    assert(hrefs(html) == Vector("/a", "/b", "/c", "/a"))
  }

  test("rawHrefs: script/style bodies and comments are skipped; close tags and <abbr> are not anchors") {
    val html =
      """<script>var s = '<a href="/fake1">';</script>
        |<style>a[href="/fake2"]{}</style>
        |<!-- <a href="/fake3"> -->
        |<abbr href="/fake4">n</abbr></a>
        |<a target="_b" href="/real">ok</a>""".stripMargin
    assert(hrefs(html) == Vector("/real"))
  }

  test("rawHrefs: entities decode, quoted '>' in other tags doesn't fabricate links, '<!--' in script is script text") {
    // &amp; is the spec-compliant way to write & in an attribute — without
    // decoding, multi-parameter urls could never match a corpus url
    assert(hrefs("""<a href="/p?a=1&amp;b=2&#47;x">t</a>""") == Vector("/p?a=1&b=2/x"))
    assert(hrefs("""<a href="/q?x=&unknown;1">t</a>""") == Vector("/q?x=&unknown;1"))
    // a '>' inside a quoted attribute of a NON-anchor tag must not restart
    // parsing mid-value (that fabricated '/fake' edges before the fix)
    assert(hrefs("""<div data-tip="see > <a href=/fake>here</a>"></div><a href="/real">x</a>""")
      == Vector("/real"))
    // '<!--' inside a script body is script text, not a comment opener —
    // it must not swallow the anchors after the script closes
    assert(hrefs("""<script>var re = /<!--/;</script><a href="/after">x</a>""")
      == Vector("/after"))
  }

  test("rawAnchors: visible text with embedded tags as separators; unclosed and nested anchors") {
    assert(HtmlLinks.rawAnchors("""<a href="/x">Hello <b>big</b> world</a>""".getBytes("UTF-8"))
      == Vector(("/x", "Hello big world")))
    assert(HtmlLinks.rawAnchors("""<a href="/e">A &amp; B</a>""".getBytes("UTF-8"))
      == Vector(("/e", "A & B")))
    // no visible text -> ""
    assert(HtmlLinks.rawAnchors("""<a href="/img"><img src=i.png></a>""".getBytes("UTF-8"))
      == Vector(("/img", "")))
    // unclosed anchor runs to the next <a (everywhere on the real web)
    assert(HtmlLinks.rawAnchors("""<a href="/u">first <a href="/v">second</a>""".getBytes("UTF-8"))
      == Vector(("/u", "first"), ("/v", "second")))
    // unclosed at end of input
    assert(HtmlLinks.rawAnchors("""<a href="/t">tail text""".getBytes("UTF-8"))
      == Vector(("/t", "tail text")))
    // whitespace collapses
    assert(HtmlLinks.rawAnchors("<a href=/w>  a \n\t b  </a>".getBytes("UTF-8"))
      == Vector(("/w", "a b")))
  }

  test("anchors: resolution applies per pair; PDF payloads yield none") {
    val html = """<a href="b.html">go</a><a href="#f">frag</a>""".getBytes("UTF-8")
    assert(HtmlLinks.anchors(html, "https://h.example/d/p.html")
      == Vector(("https://h.example/d/b.html", "go")))
    assert(HtmlLinks.anchors("%PDF-1.4 <a href=/x>t</a>".getBytes, "https://h/d.pdf")
      == Vector.empty)
  }

  test("rawHrefs: total on garbage and on anchors with no href") {
    assert(HtmlLinks.rawHrefs(null) == Vector.empty)
    assert(hrefs("<a>no href</a><a name=x>still none</a>") == Vector.empty)
    val junk = Array.tabulate[Byte](4096)(i => ((i * 31 + 7) % 251).toByte)
    HtmlLinks.rawHrefs(junk) // must not throw
  }

  test("resolve: absolute, protocol-relative, root-relative, relative with dot segments") {
    val base = "https://host.example/dir/sub/page.html?q=1"
    assert(HtmlLinks.resolve(base, "https://other.org/x") == "https://other.org/x")
    assert(HtmlLinks.resolve(base, "//cdn.example/y") == "https://cdn.example/y")
    assert(HtmlLinks.resolve(base, "/rooted/z") == "https://host.example/rooted/z")
    assert(HtmlLinks.resolve(base, "sibling.html") == "https://host.example/dir/sub/sibling.html")
    assert(HtmlLinks.resolve(base, "../up.html") == "https://host.example/dir/up.html")
    assert(HtmlLinks.resolve(base, "../../../past-root.html") == "https://host.example/past-root.html")
    assert(HtmlLinks.resolve(base, "./here.html") == "https://host.example/dir/sub/here.html")
    assert(HtmlLinks.resolve(base, "a/b/../c.html") == "https://host.example/dir/sub/a/c.html")
    assert(HtmlLinks.resolve(base, "dir/") == "https://host.example/dir/sub/dir/")
    assert(HtmlLinks.resolve(base, "?q=2") == "https://host.example/dir/sub/page.html?q=2")
  }

  test("resolve: fragments strip; non-navigational schemes and unparseable bases are null") {
    val base = "https://h.example/p/page.html"
    assert(HtmlLinks.resolve(base, "#top") == null)
    assert(HtmlLinks.resolve(base, "x.html#frag") == "https://h.example/p/x.html")
    assert(HtmlLinks.resolve(base, "javascript:void(0)") == null)
    assert(HtmlLinks.resolve(base, "mailto:a@b.c") == null)
    assert(HtmlLinks.resolve(base, "data:text/plain,x") == null)
    assert(HtmlLinks.resolve(base, "tel:+1") == null)
    assert(HtmlLinks.resolve("not-a-url", "/x") == null)
    assert(HtmlLinks.resolve(null, "/x") == null)
    assert(HtmlLinks.resolve(base, null) == null)
  }

  test("links: PDF payloads yield none (the pipeline dispatch rule); non-http schemes resolve too") {
    val pdf = "%PDF-1.4 <a href=\"/x\">".getBytes("UTF-8")
    assert(HtmlLinks.links(pdf, "https://h.example/doc.pdf") == Vector.empty)
    // the synth corpus's test:// scheme still resolves (scheme-agnostic)
    val html = "<a href=\"/other\">x</a>".getBytes("UTF-8")
    assert(HtmlLinks.links(html, "test://crawl/3/page.html") ==
      Vector("test://crawl/other"))
  }

  test("html_links is a registered native (SQL path == kernel)") {
    val spark = SparkTestBase.spark
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(("https://h.example/d/p.html",
      """<a href="a.html">1</a><script><a href="no"></script><a href="/b">2</a>"""
        .getBytes("UTF-8"))).toDF("url", "html")
    df.createOrReplaceTempView("pages")
    val got = spark.sql("SELECT explode(html_links(url, html)) AS l FROM pages")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq("https://h.example/d/a.html", "https://h.example/b"))
    // plan stays native (no UDF nodes)
    val plan = spark.sql("SELECT html_links(url, html) FROM pages")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"), plan)
  }
}
