package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.concurrent.TimeLimits
import org.scalatest.time.{Seconds, Span}
import java.nio.charset.StandardCharsets.ISO_8859_1

/** Scale guards for the kernel on documents far larger than the fixtures:
  * parse cost must stay near-linear in payload size and object count — a
  * quadratic scan or unguarded backtracking would melt an executor on the
  * multi-GB tail of a real crawl. */
class LargeDocSpec extends AnyFunSuite with TimeLimits {

  /** well-formed PDF with n string objects + xref table + trailer. */
  private def synthPdf(n: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb ++= "%PDF-1.7\n"
    val offsets = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      offsets(i) = sb.length
      sb ++= s"$i 0 obj\n(payload value number $i with some text)\nendobj\n"
      i += 1
    }
    val xrefOff = sb.length
    sb ++= s"xref\n0 ${n + 1}\n"
    sb ++= "0000000000 65535 f \n"
    i = 1
    while (i <= n) { sb ++= f"${offsets(i)}%010d 00000 n \n"; i += 1 }
    sb ++= s"trailer\n<</Size ${n + 1}>>\nstartxref\n$xrefOff\n%%EOF"
    sb.toString.getBytes(ISO_8859_1)
  }

  test("20k objects (~1.2 MB): full parse under 10s, all objects extracted") {
    val pdf = synthPdf(20000)
    failAfter(Span(10, Seconds)) {
      val r = PdfExtract.parse(pdf)
      assert(r.ok)
      assert(r.nObjects == 20000L)
    }
  }

  test("near-linear growth: 4x objects < 10x time") {
    def time(n: Int): Double = {
      val pdf = synthPdf(n)
      val t0 = System.nanoTime()
      PdfExtract.parse(pdf)
      (System.nanoTime() - t0) / 1e9
    }
    time(2000) // warmup
    val t1 = math.min(time(5000), time(5000))
    val t2 = math.min(time(20000), time(20000))
    assert(t2 < t1 * 10 + 0.5, s"t(5k)=$t1 t(20k)=$t2")
  }

  test("8 MB stream payload: single pass, under 5s") {
    val big = new StringBuilder
    big ++= "%PDF-1.7\n1 0 obj\n<</Length 1>>\nstream\n"
    big ++= "A" * (8 << 20)
    big ++= "\nendstream\nendobj\n"
    val off = 9
    big ++= s"xref\n0 2\n0000000000 65535 f \n${f"$off%010d"} 00000 n \ntrailer\n<</Size 2>>\nstartxref\n${big.length}\n%%EOF"
    val bytes = big.toString.getBytes(ISO_8859_1)
    failAfter(Span(5, Seconds)) {
      val r = PdfExtract.parse(bytes)
      assert(r.nObjects >= 1)
    }
  }

  test("pathological: 2 MB of digits and whitespace terminates quickly") {
    val junk = ("1234567890 " * 190000).getBytes(ISO_8859_1)
    failAfter(Span(10, Seconds)) {
      val r = PdfExtract.parse(junk)
      assert(r != null)
    }
  }
}
