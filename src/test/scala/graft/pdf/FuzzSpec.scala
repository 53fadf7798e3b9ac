package graft.pdf

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.ISO_8859_1
import graft.sources.CrawlCorpus.splitmix64

/** The deterministic mutation engine (16 kinds), shared by FuzzSpec and
  * the large out-of-band sweeps (FuzzSweep). */
object FuzzMutations {
  val Kinds = 16L
  def mutate(base: Array[Byte], seed: Long): Array[Byte] = {
    val kind = math.floorMod(splitmix64(seed), Kinds).toInt
    val b = base.clone()
    def idx(k: Long): Int =
      if (b.length == 0) 0 else math.floorMod(splitmix64(seed ^ k), b.length.toLong).toInt
    kind match {
      case 0 => java.util.Arrays.copyOfRange(b, 0, idx(1)) // truncate
      case 1 => // flip 8 bits
        var i = 0
        while (i < 8) {
          if (b.length > 0) {
            val p = idx(10 + i)
            b(p) = (b(p) ^ (1 << math.floorMod(splitmix64(seed ^ (20 + i)), 8L).toInt)).toByte
          }
          i += 1
        }
        b
      case 2 => // overwrite a run
        val s = idx(2); val e = math.min(b.length, s + 16)
        java.util.Arrays.fill(b, s, e, 'A'.toByte); b
      case 3 => // splice two fixtures
        val other = Fixtures.all(math.floorMod(splitmix64(seed ^ 3), Fixtures.all.length.toLong).toInt)._2
        java.util.Arrays.copyOfRange(b, 0, idx(4)) ++
          java.util.Arrays.copyOfRange(other, idx(5).min(other.length - 1).max(0), other.length)
      case 4 => // inject structural tokens
        val tok = " 0 1 R stream endstream obj endobj << >> [ ] (".getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(6)) ++ tok ++
          java.util.Arrays.copyOfRange(b, idx(6).min(b.length), b.length)
      case 5 => // inject encryption/xref tokens (this kind found the
        // self-referential-filter infinite recursion, DIVERGENCES #10)
        val tok = (" /Encrypt 1 0 R /Filter /Standard /V 4 /R 4 " +
          "/CF <</StdCF <</CFM /AESV2>> >> stream endstream xref trailer startxref").getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(6)) ++ tok ++
          java.util.Arrays.copyOfRange(b, idx(6).min(b.length), b.length)
      case 6 => // double-splice three fixtures
        val o1 = Fixtures.all(math.floorMod(splitmix64(seed ^ 7), Fixtures.all.length.toLong).toInt)._2
        val o2 = Fixtures.all(math.floorMod(splitmix64(seed ^ 8), Fixtures.all.length.toLong).toInt)._2
        o1.take(idx(9)) ++ b.drop(idx(11)) ++
          o2.take(math.floorMod(splitmix64(seed ^ 12), o2.length.toLong).toInt)
      case 7 => b ++ b // whole-document duplication (two bodies, two xrefs)
      case 8 => b.reverse
      case 9 => // inject an /ObjStm + xref-stream skeleton (round-3 widening:
        // the type-2 expansion path gets its own structural tokens)
        val tok = (" /Type /ObjStm /N 3 /First 5 /Extends 1 0 R " +
          "/Type /XRef /W [1 4 2] /Index [0 6] /Prev 0 stream\n2 0 3 8 endstream").getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(13)) ++ tok ++
          java.util.Arrays.copyOfRange(b, idx(13).min(b.length), b.length)
      case 10 => // inject security-handler variants (V1/V2, R2/R3, crypt
        // filters, exclusions) with /O /U key material tokens
        val tok = (" /Encrypt <</Filter /Standard /V 2 /R 3 /Length 128 /P -44 " +
          "/O (0123456789abcdef0123456789abcdef) /U (fedcba9876543210fedcba9876543210) " +
          "/StmF /StdCF /StrF /Identity /EFF /StdCF>> /Crypt /Identity ").getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(14)) ++ tok ++
          java.util.Arrays.copyOfRange(b, idx(14).min(b.length), b.length)
      case 11 => // corrupt numeric fields: overwrite a digit run with a huge
        // length-looking number (length bombs, offset bombs)
        val tok = " 2147483647 999999999999999999 ".getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(15)) ++ tok ++
          java.util.Arrays.copyOfRange(b, idx(15).min(b.length), b.length)
      case 12 => // filter-chain bombs (round-4 widening): deep /Filter
        // arrays + predictor Columns/Colors/BitsPerComponent extremes
        // aimed at the bit-granular TIFF path and the PNG row machinery
        val tok = (" /Filter [/FlateDecode /LZWDecode /ASCIIHexDecode /ASCII85Decode " +
          "/RunLengthDecode /FlateDecode /FlateDecode /LZWDecode] " +
          "/DecodeParms [<</Predictor 2 /Columns 2147483647 /Colors 64 /BitsPerComponent 1>> " +
          "<</Predictor 15 /Columns 0 /Colors 0 /BitsPerComponent 16>> " +
          "<</Predictor 2 /Columns 3 /Colors 3 /BitsPerComponent 2 /EarlyChange 0>> null] ")
          .getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(16)) ++ tok ++
          java.util.Arrays.copyOfRange(b, idx(16).min(b.length), b.length)
      case 13 => // cross-document password material (round-4 widening):
        // splice another fixture's tail UNDER an injected security handler
        // whose V/R/Length/O/U shapes disagree with it — key derivation and
        // password verification must fail per-document, never hang or throw
        val other = Fixtures.all(math.floorMod(splitmix64(seed ^ 17), Fixtures.all.length.toLong).toInt)._2
        val tok = (" /Encrypt <</Filter /Standard /V 1 /R 2 /Length 40 /P -1 " +
          "/O (short) /U () /EncryptMetadata false>> " +
          "/Encrypt <</Filter /Standard /V 5 /R 6 /CF <</StdCF <</CFM /AESV3 /Length 32>>>>>> ")
          .getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(18)) ++ tok ++
          java.util.Arrays.copyOfRange(other, idx(19).min(other.length - 1).max(0), other.length)
      case 14 => // content-stream text-operator + CMap bombs (round-5
        // widening): giant Tf sizes, dense TJ arrays, quote/doublequote
        // shows and bfrange spans aimed at the BT..ET scan, the
        // width-stride decode and the MaxCmapSize guard
        val tok = (" BT /F1 2147483647 Tf [(a) 1 (b) -2147483648 (c)] TJ " +
          "(x) Tj (y) ' (z) \" ET BT ET BT /ToUnicode 1 0 R " +
          "begincmap beginbfrange <0000> <ffff> <0041> endbfrange " +
          "beginbfchar <20> <0020> endbfchar endcmap /Widths [1 2 3] Tz Tc Tw TL Td TD Tm T* ")
          .getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(20)) ++ tok ++
          java.util.Arrays.copyOfRange(b, idx(20).min(b.length), b.length)
      case _ => // name-tree / action / embedded-file walk bombs (round-5
        // widening): /Names kid cycles, JavaScript+URI actions, file specs
        // with the trailing-space quirk — aimed at the recursive extraction
        // walk (G1-G7), not the parser
        val tok = (" /Names <</EmbeddedFiles <</Kids [1 0 R 1 0 R] /Names [(f) 1 0 R]>> " +
          "/JavaScript <</Names [(js) 1 0 R]>>>> /OpenAction <</S /JavaScript /JS (p)>> " +
          "/AA <</O 1 0 R /C 1 0 R>> /A <</S /URI /URI (http://x/)>> " +
          "/EF <</F 1 0 R /UF 1 0 R>> /F (name.bin ) /UF (uni.bin ) /Desc (d) " +
          "/Annots [<</A <</URI (u)>>>> <</A 1 0 R>>] /Kids [1 0 R] /Limits [(a) (z)] ")
          .getBytes(ISO_8859_1)
        java.util.Arrays.copyOfRange(b, 0, idx(21)) ++ tok ++
          java.util.Arrays.copyOfRange(b, idx(21).min(b.length), b.length)
    }
  }
}

/** Deterministic mutation fuzz over every reference fixture plus crafted
  * adversarial shapes. Contract (the corpus is hostile by definition):
  * NO document ever produces failure=internal — per-document isolation
  * must degrade to the reference's error channel, not to an engine
  * exception — and every parse stays under the reference's own implicit
  * per-document latency bound (unit_test.go's 1 s timeout pattern). */
class FuzzSpec extends AnyFunSuite {

  private def mutate(base: Array[Byte], seed: Long): Array[Byte] =
    FuzzMutations.mutate(base, seed)

  private def check(payload: Array[Byte], tag: String, objectStreams: Boolean = false): Unit = {
    val t0 = System.nanoTime()
    val r = PdfExtract.parse(payload, "", objectStreams)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(r.failure == null || !r.failure.startsWith("internal:"), s"$tag -> ${r.failure}")
    if (ms >= 1000) {
      // a genuine parser loop reproduces; a GC pause / noisy-host
      // descheduling blip under parallel suite load does not — retry once
      // before declaring a DoS-contract violation
      val t1 = System.nanoTime()
      PdfExtract.parse(payload, "", objectStreams)
      val retryMs = (System.nanoTime() - t1) / 1e6
      assert(retryMs < 1000, s"$tag took $ms ms, retry $retryMs ms")
    }
  }

  test("mutation fuzz: fixture mutations (16 kinds), zero internal failures, all < 1 s") {
    for (fi <- Fixtures.all.indices; s <- 0 until 100)
      check(mutate(Fixtures.all(fi)._2, fi * 100000L + s), s"${Fixtures.names(fi)}#$s")
  }

  test("mutation fuzz with objectStreams=true: the ObjStm expansion path never fails internally") {
    for (fi <- Fixtures.all.indices; s <- 0 until 50)
      check(mutate(Fixtures.all(fi)._2, 7777L + fi * 100000L + s),
        s"${Fixtures.names(fi)}#objstm#$s", objectStreams = true)
  }

  test("mutation fuzz seeded on a real ObjStm document (both expansion modes)") {
    // the fixture corpus has no /ObjStm document; seed the mutator on the
    // crafted one so the xref-stream decode + container expansion see
    // structurally-broken inputs, not just token injections
    val base = TestPdfs.objStmPdf()
    for (s <- 0 until 300) {
      check(mutate(base, 31337L + s), s"objstm-base#$s")
      check(mutate(base, 61337L + s), s"objstm-base#on#$s", objectStreams = true)
    }
  }

  test("mutation fuzz on encrypted.pdf with the real and a wrong password") {
    val base = Fixtures.bytes("encrypted.pdf")
    for (s <- 0 until 300) {
      val m = mutate(base, 91337L + s)
      val t0 = System.nanoTime()
      val r1 = PdfExtract.parse(m) // empty password (the fixture's)
      val r2 = PdfExtract.parse(m, "wrong")
      val ms = (System.nanoTime() - t0) / 1e6
      for (r <- Seq(r1, r2))
        assert(r.failure == null || !r.failure.startsWith("internal:"), s"enc#$s -> ${r.failure}")
      assert(ms < 2000, s"enc#$s took $ms ms")
    }
  }

  test("random blobs with a pdf header never fail internally") {
    for (s <- 0 until 500) {
      val len = 64 + math.floorMod(splitmix64(s * 7L), 4096L).toInt
      val b = Array.tabulate[Byte](len)(i => (splitmix64(s * 131L + i) & 0xff).toByte)
      System.arraycopy("%PDF-1.7\n".getBytes(ISO_8859_1), 0, b, 0, math.min(9, len))
      check(b, s"rand#$s")
    }
  }

  test("filter-chain bombs on a REAL stream: deep chains and predictor extremes terminate clean") {
    // a valid document whose one content stream carries increasingly
    // hostile filter metadata — unlike the token-injection kind, the
    // decode chain actually RUNS here because the stream itself is intact
    def doc(filterMeta: String): Array[Byte] =
      ("%PDF-1.7\n1 0 obj\n<</Length 11 " + filterMeta + ">>\nstream\nhello world\nendstream\nendobj\n" +
        "trailer <</Root 2 0 R>>\n").getBytes(ISO_8859_1)
    val metas = Seq(
      "/Filter [" + ("/FlateDecode " * 64) + "]",
      "/Filter [/LZWDecode /LZWDecode /LZWDecode /LZWDecode]",
      "/Filter /FlateDecode /DecodeParms <</Predictor 2 /Columns 2147483647 /Colors 2147483647 /BitsPerComponent 16>>",
      "/Filter /FlateDecode /DecodeParms <</Predictor 2 /Columns 3 /Colors 3 /BitsPerComponent 1>>",
      "/Filter /FlateDecode /DecodeParms <</Predictor 14 /Columns -1 /Colors 0 /BitsPerComponent 0>>",
      "/Filter /RunLengthDecode /DecodeParms <</Predictor 2 /Columns 999999999 /BitsPerComponent 2>>")
    metas.zipWithIndex.foreach { case (m, i) => check(doc(m), s"filter-bomb#$i") }
  }

  test("cross-document password mutations: mismatched V/R/O/U shapes fail per-document, fast") {
    val enc = Fixtures.bytes("encrypted.pdf")
    // the mutator scrambles the seed (splitmix64) before the mod-Kinds
    // pick, so "seed ≡ 13 (mod Kinds)" does NOT select kind 13 — scan
    // seeds and keep exactly those that land in the cross-document lane
    val kind13Seeds = Iterator.from(0).map(_.toLong)
      .filter(s => math.floorMod(splitmix64(s), FuzzMutations.Kinds) == 13L).take(200).toSeq
    for ((seed, s) <- kind13Seeds.zipWithIndex) {
      val m = FuzzMutations.mutate(enc, seed)
      for (pw <- Seq("", "wrong", "a" * 127)) {
        val t0 = System.nanoTime()
        val r = PdfExtract.parse(m, pw)
        assert(r.failure == null || !r.failure.startsWith("internal:"), s"xpw#$s/$pw -> ${r.failure}")
        assert((System.nanoTime() - t0) / 1e6 < 2000, s"xpw#$s/$pw slow")
      }
    }
  }

  test("text-operator bombs on a REAL content stream: TJ floods and bfrange spans terminate clean") {
    // a valid page tree whose contents stream actually REACHES the BT..ET
    // scanner and CMap builder — unlike token injection, these operators run
    def doc(contents: String, toUnicode: String = ""): Array[Byte] = {
      val tu = if (toUnicode.isEmpty) ""
        else s"5 0 obj\n<</Length ${toUnicode.length}>>\nstream\n$toUnicode\nendstream\nendobj\n"
      val fontTU = if (toUnicode.isEmpty) "" else " /ToUnicode 5 0 R"
      ("%PDF-1.7\n1 0 obj\n<</Type /Catalog /Pages 2 0 R>>\nendobj\n" +
        "2 0 obj\n<</Type /Pages /Kids [3 0 R] /Count 1>>\nendobj\n" +
        s"3 0 obj\n<</Type /Page /Contents 4 0 R /Resources <</Font <</F1 <</BaseFont /H$fontTU>>>>>>>>\nendobj\n" +
        s"4 0 obj\n<</Length ${contents.length}>>\nstream\n$contents\nendstream\nendobj\n" +
        tu + "trailer <</Root 1 0 R>>\n").getBytes(ISO_8859_1)
    }
    val tjFlood = "BT /F1 1 Tf [" + ("(a) 5 " * 20000) + "] TJ ET"
    val btFlood = ("BT ET " * 20000) + "BT /F1 1 Tf (x) Tj ET"
    val quoteOps = "BT /F1 1 Tf (l1) ' (l2) \" (l3) Tj T* TL 5 Td ET"
    val hugeRange = "/CIDInit begincmap 1 beginbfrange <0000> <ffff> <0041> endbfrange endcmap"
    val badRange = "begincmap 1 beginbfrange <ff> <00> <41> endbfrange 1 beginbfchar <20> endbfchar endcmap"
    check(doc(tjFlood), "tj-flood")
    check(doc(btFlood), "bt-flood")
    check(doc(quoteOps), "quote-ops")
    check(doc("BT /F1 1 Tf (x) Tj ET", hugeRange), "bfrange-64k")
    check(doc("BT /F1 1 Tf (x) Tj ET", badRange), "bfrange-inverted")
  }

  test("adversarial shapes: reference webs, kid meshes, xfa floods") {
    check((1 to 5000).map(i => s"$i 0 obj\n<</Next ${i + 1} 0 R /Pages ${i + 1} 0 R>>\nendobj\n")
      .mkString.getBytes(ISO_8859_1), "ref-chain")
    check(("1 0 obj\n<</Pages 2 0 R>>\nendobj\n2 0 obj\n<</Kids [" +
      (3 to 2000).map(_ + " 0 R").mkString(" ") + "]>>\nendobj\n" +
      (3 to 2000).map(i => s"$i 0 obj\n<</Kids [2 0 R]>>\nendobj\n").mkString)
      .getBytes(ISO_8859_1), "kids-web")
    check(("1 0 obj\n<</XFA [" + (1 to 30000).map(_ => "(x) 1 0 R").mkString(" ") + "]>>\nendobj\n")
      .getBytes(ISO_8859_1), "xfa-flood")
  }
}
