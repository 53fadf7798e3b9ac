package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** Frozen end-to-end extraction fingerprints for all 36 reference fixtures:
  * per-sink md5 + object/stream counts, generated once from the kernel that
  * passes every transcribed reference test. This is the regression gate for
  * future refactors — any byte drift in any sink on any fixture fails here.
  * Regenerate ONLY with a documented semantic justification. */
class ExtractFingerprintSpec extends AnyFunSuite {

  private def md5(b: Array[Byte]): String = Crypto.md5(b).map(x => f"$x%02x").mkString

  test("all 36 fixtures: every sink byte-stable") {
    val in = getClass.getResourceAsStream("/goldens/extract_fingerprints.tsv")
    require(in != null)
    val goldens = scala.io.Source.fromInputStream(in, "UTF-8").getLines().map { line =>
      val f = line.split("\t", -1)
      f(0) -> f
    }.toMap
    assert(goldens.size == 36)

    Fixtures.all.foreach { case (name, bytes) =>
      val g = goldens(name)
      val r = PdfExtract.parse(bytes)
      val actual = Seq(name, r.ok.toString, Option(r.failure).getOrElse("-"),
        md5(r.contents), md5(r.javascript), md5(r.urls), md5(r.files),
        md5(r.commands), md5(r.errors), md5(r.raw), r.nObjects.toString,
        r.nStreams.toString)
      assert(actual == g.toSeq, s"fingerprint drift for $name")
    }
  }
}
