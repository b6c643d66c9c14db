package graft.tools

import graft.core.{ExtractText, Pdf}
import graft.pipeline.MiniPdf

/** Dev probe: replay the byte-mutation differential's seeded mutations and
  * dump a specific mutation index (flipped positions/values, our output, and
  * the mutated bytes to a file for running the reference binary by hand).
  *
  * SYNC CONTRACT (round-6 review): the generator below must consume the RNG
  * byte-for-byte like QuirkDifferentialSpec's "byte-mutation fuzz" loop —
  * same seed (9), same base text, same `(0 to nextInt(2))` flip count, same
  * nextInt(length)/nextInt(256) order. If you change the spec's mutation
  * scheme, change THIS file in the same commit or the probe dumps the wrong
  * document (its one job). Lives in tools/ per the repo's probe convention.
  */
object MutProbe {
  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("scan")) { scan(args(1).toInt); return }
    val target = if (args.nonEmpty) args(0).toInt else 30
    val base = MiniPdf.synthesize("mutation fuzz target with some words")
    val rnd = new scala.util.Random(9)
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

  /** Scan mode (`MutProbe scan <n>`): replay the first n seeded mutations and
    * report every index whose strict extract escapes with a RAW throwable
    * (anything but PdfParseException) — the class of engine bug the 40k sweep
    * caught in round 7 (negative xref offset -> raw AIOOBE in the lexer).
    */
  private def scan(n: Int): Unit = {
    val base = MiniPdf.synthesize("mutation fuzz target with some words")
    val rnd = new scala.util.Random(9)
    var raw = 0
    (0 until n).foreach { i =>
      val m = base.clone()
      (0 to rnd.nextInt(2)).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      try { Pdf(m).extract(ExtractText); () } catch {
        case _: graft.core.PdfParseException => ()
        case e: Throwable =>
          raw += 1
          println(s"RAW THROW at mutation $i: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    println(s"scanned $n mutations, $raw raw throws")
  }
}
