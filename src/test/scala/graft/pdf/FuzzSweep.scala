package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** Opt-in large fuzz sweep (skipped unless GRAFT_SWEEP=1 is set; run with
  * `GRAFT_SWEEP=1 sbt "testOnly graft.pdf.FuzzSweep"`): ~120k mutated
  * documents across every fixture, the crafted ObjStm document and
  * encrypted.pdf, all 12 mutation kinds, both /ObjStm expansion modes,
  * parallel across cores. The per-round evidence for the "zero internal
  * failures at >=50k docs" bar. */
class FuzzSweep extends AnyFunSuite {

  test("120k-document mutation sweep: zero internal failures, all < 1 s") {
    assume(sys.env.get("GRAFT_SWEEP").contains("1"), "opt-in: GRAFT_SWEEP=1")
    val bases: IndexedSeq[(String, Array[Byte])] =
      (Fixtures.all.map { case (n, b) => (n, b) } ++ Seq(
        ("objstm", TestPdfs.objStmPdf()),
        ("objstm-miss", TestPdfs.objStmPdf(indexCorrect = false)))).toIndexedSeq
    val perBase = 1600 // x 38 bases x 2 modes = 121.6k parses
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val done = new java.util.concurrent.atomic.AtomicLong(0)

    java.util.stream.IntStream.range(0, bases.length * perBase).parallel().forEach { i =>
      val (name, base) = bases(i % bases.length)
      val seed = 424242L + i
      val m = FuzzMutations.mutate(base, seed)
      for (objectStreams <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val r = PdfExtract.parse(m, "", objectStreams)
        val ms = (System.nanoTime() - t0) / 1e6
        if (r.failure != null && r.failure.startsWith("internal:"))
          failures.add(s"$name#$seed(objstm=$objectStreams) -> ${r.failure}")
        if (ms >= 1000)
          failures.add(s"$name#$seed(objstm=$objectStreams) took $ms ms")
        done.incrementAndGet()
      }
    }
    info(s"${done.get()} parses, ${failures.size()} failures")
    assert(failures.isEmpty, failures.stream().limit(10).toArray.mkString("\n"))
  }
}
