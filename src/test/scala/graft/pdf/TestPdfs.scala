package graft.pdf

import java.nio.charset.StandardCharsets.ISO_8859_1

/** Shared crafted-PDF builders for the specs (fixture-quality synthetic
  * payloads the reference's own testdata does not cover). */
object TestPdfs {

  /** A well-formed PDF whose catalog and page live inside an object
    * stream, indexed by an xref STREAM with W=[1,4,2] entries.
    * `indexCorrect = false` mis-sorts the in-container index to exercise
    * the scan-by-objnum fallback. */
  def objStmPdf(indexCorrect: Boolean = true): Array[Byte] = {
    val body2 = "<</Pages 3 0 R>>"
    val body3 = "<</Type /Page /Contents 4 0 R>>"
    val header = s"2 0 3 ${body2.length} "
    val content = header + body2 + body3
    val cs = "BT (Hello ObjStm) Tj ET"

    val head = "%PDF-1.5\n"
    val obj1 = s"1 0 obj\n<</Type /ObjStm /N 2 /First ${header.length} /Length ${content.length}>>\nstream\n$content\nendstream\nendobj\n"
    val off1 = head.length
    val off4 = off1 + obj1.length
    val obj4 = s"4 0 obj\n<</Length ${cs.length}>>\nstream\n$cs\nendstream\nendobj\n"
    val off5 = off4 + obj4.length

    def entry(t: Int, off: Long, gen: Int): Array[Byte] = Array[Byte](
      t.toByte,
      ((off >> 24) & 0xff).toByte, ((off >> 16) & 0xff).toByte,
      ((off >> 8) & 0xff).toByte, (off & 0xff).toByte,
      ((gen >> 8) & 0xff).toByte, (gen & 0xff).toByte)

    // type-2 "generation" = index within the container; optionally wrong to
    // exercise the scan-by-objnum fallback
    val idx2 = if (indexCorrect) 0 else 1
    val idx3 = if (indexCorrect) 1 else 0
    val xrefData =
      entry(0, 0, 0xffff) ++ entry(1, off1, 0) ++
        entry(2, 1, idx2) ++ entry(2, 1, idx3) ++
        entry(1, off4, 0) ++ entry(1, off5, 0)

    val obj5 = s"5 0 obj\n<</Type /XRef /Size 6 /W [1 4 2] /Root 2 0 R /Length ${xrefData.length}>>\nstream\n"
    val tail = s"\nendstream\nendobj\nstartxref\n$off5\n%%EOF\n"

    head.getBytes(ISO_8859_1) ++ obj1.getBytes(ISO_8859_1) ++ obj4.getBytes(ISO_8859_1) ++
      obj5.getBytes(ISO_8859_1) ++ xrefData ++ tail.getBytes(ISO_8859_1)
  }
}
