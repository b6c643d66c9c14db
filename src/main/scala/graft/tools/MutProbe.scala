package graft.tools

import graft.core.{ExtractText, Pdf}
import graft.pipeline.MiniPdf

/** Dev probe: replay the byte-mutation differential's seeded mutations and
  * dump a specific mutation index (flipped positions/values, our output, and
  * the mutated bytes to a file for running the reference binary by hand).
  *
  * SYNC CONTRACT (round-6 review): QuirkDifferentialSpec's "byte-mutation
  * fuzz" loop and this probe must consume the RNG byte-for-byte — both sides
  * use `bases` below (name, seed, document), the same `(0 to nextInt(2))`
  * flip count, and the same nextInt(length)/nextInt(256) order, so a failing
  * index reported by either is replayable by the other. Lives in tools/ per
  * the repo's probe convention.
  */
object MutProbe {

  /** The mutation-fuzz base menu. All bases are UNCOMPRESSED on purpose:
    * corrupt-zlib behavior would compare the vendored inflate stub against
    * the JDK Inflater, not reference semantics. Seeds are distinct so each
    * base explores an independent flip stream. "plain" keeps the historic
    * seed 9 (round-6/7 finds — lone-')', past-EOF heal, negative offset —
    * stay at their recorded indices).
    */
  val bases: Seq[(String, Int, () => Array[Byte])] = Seq(
    ("plain", 9, () => MiniPdf.synthesize("mutation fuzz target with some words")),
    ("multitj", 10, () => MiniPdf.synthesizeMultiTj("mutation fuzz target with some words", 7)),
    ("multipage", 11, () => MiniPdf.synthesizeMultiPage("mutation fuzz page text for the sweep", 9)),
    ("incremental", 12, () => MiniPdf.synthesizeIncremental(
      Seq("mutation fuzz base revision", "second revision text", "third revision words"))),
    // cmap base (round 7): flips reach the /ToUnicode stream — the cmap
    // parser's panic/typing edges under random corruption, plus TJ-vs-Tj
    // text assembly with a live cmap
    ("cmap", 13, () => MiniPdf.synthesizeWithCMap(
      "BT\n70 50 TD\n/F1 12 Tf\n[<4142> -120 <43>] TJ\n(plain tail) Tj\nET\n",
      "3 beginbfchar <41> <0058> <42> <0059> <43> <005A> endbfchar")),
    // objstm base (round 8, VERDICT r7 #8): an UNCOMPRESSED modern layout —
    // flips reach the xref-stream header/rows and the ObjStm pair table.
    // Strict mode refuses the xref-stream catalog like the reference, so
    // binary parity covers the refusal surface; the LENIENT decode of the
    // same mutations is property-gated in LenientSpec (no binary twin there).
    ("objstm", 14, () => MiniPdf.synthesizeObjStm(
      "objstm mutation fuzz target words", compress = false))
  )

  private def baseFor(name: String): (Array[Byte], scala.util.Random) =
    bases.find(_._1 == name) match {
      case Some((_, seed, mk)) => (mk(), new scala.util.Random(seed))
      case None => sys.error(s"unknown base '$name' — one of ${bases.map(_._1).mkString(", ")}")
    }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("scan")) {
      scan(args(1).toInt, if (args.length > 2) args(2) else "plain"); return
    }
    val target = if (args.nonEmpty) args(0).toInt else 30
    val (base, rnd) = baseFor(if (args.length > 1) args(1) else "plain")
    (0 to target).foreach { i =>
      val m = base.clone()
      val flips = (0 to rnd.nextInt(2)).map { _ =>
        val pos = rnd.nextInt(m.length)
        val v = rnd.nextInt(256).toByte
        val old = m(pos)
        m(pos) = v
        (pos, old, v)
      }
      if (i == target) {
        println(s"mutation $i flips: " + flips.map { case (p, o, v) =>
          f"pos=$p old=0x${o & 0xff}%02x('${(o & 0xff).toChar}') new=0x${v & 0xff}%02x"
        }.mkString(", "))
        java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/mut.pdf"), m)
        val ours = try Pdf(m).extract(ExtractText) catch { case e: Throwable => s"THROWS ${e.getMessage}" }
        println(s"ours: '$ours'")
        println("context: " + new String(m, math.max(0, flips.head._1 - 30),
          math.min(70, m.length - math.max(0, flips.head._1 - 30)),
          java.nio.charset.StandardCharsets.ISO_8859_1).replace("\n", "\\n"))
      }
    }
  }

  /** Scan mode (`MutProbe scan <n> [base]`): replay the first n seeded
    * mutations of a base and report every index whose strict extract escapes
    * with a RAW throwable (anything but PdfParseException) — the class of
    * engine bug the 40k sweep caught in round 7 (negative xref offset -> raw
    * AIOOBE in the lexer). StackOverflowError is exempt: the engine's
    * recursion backstop intentionally lets it surface to extractTurn's
    * per-row catch where the reference recurses without a guard.
    */
  private def scan(n: Int, baseName: String): Unit = {
    val (base, rnd) = baseFor(baseName)
    var raw = 0
    (0 until n).foreach { i =>
      val m = base.clone()
      (0 to rnd.nextInt(2)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      try { Pdf(m).extract(ExtractText); () } catch {
        case _: graft.core.PdfParseException => ()
        case _: StackOverflowError => ()
        case e: Throwable =>
          raw += 1
          println(s"RAW THROW at $baseName mutation $i: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"scanned $n '$baseName' mutations, $raw raw throws")
  }
}
