package graft.html

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.CrawlCorpus.{genHtml, splitmix64}

/** Deterministic fuzz of the HTML boilerplate-strip path: mutated real
  * pages, random byte blobs (invalid UTF-8 included), and adversarial
  * bombs. Contract: never throws, bounded latency. */
class HtmlFuzzSpec extends AnyFunSuite {

  private val scratch = new HtmlExtract.Scratch

  private def check(b: Array[Byte], tag: String): Unit = {
    val t0 = System.nanoTime()
    HtmlExtract.extractBytes(b, scratch) // must not throw
    assert((System.nanoTime() - t0) / 1e6 < 1000, s"$tag too slow")
  }

  test("mutated real pages never throw") {
    for (id <- 0 until 100; s <- 0 until 10) {
      val base = genHtml(id * 2 + 1, 42L, 1).getBytes("UTF-8")
      val b = base.clone()
      val k = math.floorMod(splitmix64(id * 100L + s), base.length.toLong).toInt
      math.floorMod(splitmix64(s * 31L + id), 4L).toInt match {
        case 0 => check(java.util.Arrays.copyOfRange(b, 0, k), s"trunc#$id#$s")
        case 1 => b(k) = (b(k) ^ 0x55).toByte; check(b, s"flip#$id#$s")
        case 2 => check(b ++ java.util.Arrays.copyOfRange(b, 0, k), s"dup#$id#$s")
        case _ => check(b.reverse, s"rev#$id#$s")
      }
    }
  }

  test("random byte blobs never throw") {
    for (s <- 0 until 500) {
      val len = math.floorMod(splitmix64(s * 17L), 8192L).toInt
      check(Array.tabulate[Byte](len)(i => (splitmix64(s * 257L + i) & 0xff).toByte), s"rand#$s")
    }
  }

  test("adversarial bombs stay bounded") {
    check(("<div>" * 100000).getBytes, "deep-div")
    check(("<" * 500000).getBytes, "lt-flood")
    check(("&amp;" * 200000).getBytes, "entity-flood")
    check(("<script>" + "x" * 1000000).getBytes, "unclosed-script")
    check("<!--".getBytes ++ Array.fill[Byte](1000000)('y'), "unclosed-comment")
  }

  // ---- link-extraction kernel: same totality/latency contract ----

  private def checkLinks(b: Array[Byte], tag: String): Unit = {
    val t0 = System.nanoTime()
    val out = HtmlLinks.links(b, "https://fuzz.example/dir/page.html") // must not throw
    assert((System.nanoTime() - t0) / 1e6 < 1000, s"$tag too slow")
    // every resolved link is absolute (has a scheme) — the resolver's contract
    assert(out.forall(_.contains(":")), s"$tag produced a non-absolute link")
  }

  test("links: mutated real pages and random blobs never throw; resolve is total on junk hrefs") {
    for (id <- 0 until 60; s <- 0 until 5) {
      val base = genHtml(id * 2 + 1, 42L, 1).getBytes("UTF-8")
      val b = base.clone()
      val k = math.floorMod(splitmix64(id * 100L + s), base.length.toLong).toInt
      math.floorMod(splitmix64(s * 31L + id), 4L).toInt match {
        case 0 => checkLinks(java.util.Arrays.copyOfRange(b, 0, k), s"trunc#$id#$s")
        case 1 => b(k) = (b(k) ^ 0x55).toByte; checkLinks(b, s"flip#$id#$s")
        case 2 => checkLinks(b ++ java.util.Arrays.copyOfRange(b, 0, k), s"dup#$id#$s")
        case _ => checkLinks(b.reverse, s"rev#$id#$s")
      }
    }
    for (s <- 0 until 300) {
      val len = math.floorMod(splitmix64(s * 19L), 8192L).toInt
      checkLinks(Array.tabulate[Byte](len)(i => (splitmix64(s * 263L + i) & 0xff).toByte), s"rand#$s")
      // junk hrefs through the resolver directly
      val junk = new String(Array.tabulate[Byte](math.floorMod(splitmix64(s), 64L).toInt)(
        i => (splitmix64(s * 7L + i) & 0x7f).toByte), "ISO-8859-1")
      HtmlLinks.resolve("https://fuzz.example/a/b.html", junk) // must not throw
    }
    checkLinks(("<a href=\"" + "x" * 500000).getBytes, "unclosed-href")
    checkLinks(("<a href=/x>" * 100000).getBytes, "anchor-flood")
    checkLinks(("<a " + "data-k=v " * 100000 + ">").getBytes, "attr-flood")
  }
}
