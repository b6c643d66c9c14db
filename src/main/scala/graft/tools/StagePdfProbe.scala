package graft.tools

import graft.core.{ExtractText, Pdf}
import graft.pipeline.MiniPdf

/** Diagnostic: per-stage cost inside one small-PDF extraction (construction =
  * trim + EOF check + startxref + xref parse, vs catalog+page parse + content
  * interpretation). Drives optimization of the per-turn hot path.
  */
object StagePdfProbe {
  def main(args: Array[String]): Unit = {
    val text = "the quick brown fox jumps over a lazy dog again and again " * 3
    val payload = MiniPdf.synthesize(text)
    val b64 = java.util.Base64.getEncoder.encodeToString(payload)
    val n = 50000

    def time(name: String)(f: => Any): Unit = {
      var i = 0
      while (i < n / 5) { f; i += 1 } // warm
      val t0 = System.nanoTime()
      i = 0
      while (i < n) { f; i += 1 }
      val us = (System.nanoTime() - t0) / 1000.0 / n
      println(f"$name%-28s ${us}%8.2f us/op")
    }

    time("base64 decode")(java.util.Base64.getDecoder.decode(b64))
    val bytes = java.util.Base64.getDecoder.decode(b64)
    time("Pdf construction (xref)")(Pdf(bytes))
    val pdf = Pdf(bytes)
    time("extract Text (reuse Pdf)")(pdf.extract(ExtractText))
    time("full turn (construct+extract)")(Pdf(bytes).extract(ExtractText))
    time("readInfo")(pdf.readInfo)

    // per-char slope: extract cost vs text length isolates the glyph loop
    for (len <- Seq(10, 100, 400)) {
      val p = Pdf(MiniPdf.synthesize("x" * len))
      time(s"extract len=$len")(p.extract(ExtractText))
    }

    // reference fixtures: construction vs extraction split per file
    for (name <- Seq("sample.pdf", "002-trivial-libre-office-writer.pdf", "index.pdf")) {
      val path = java.nio.file.Paths.get("/root/reference/data", name)
      if (java.nio.file.Files.exists(path)) {
        val fb = java.nio.file.Files.readAllBytes(path)
        val m = 2000
        def timeN(label: String)(f: => Any): Unit = {
          var i = 0; while (i < m / 5) { f; i += 1 }
          val t0 = System.nanoTime(); i = 0
          while (i < m) { f; i += 1 }
          println(f"$label%-44s ${(System.nanoTime() - t0) / 1000.0 / m}%8.2f us/op")
        }
        timeN(s"$name construct")(Pdf(fb))
        val p = Pdf(fb)
        timeN(s"$name raw (parse+inflate)")(p.extract(graft.core.ExtractRawContent))
        timeN(s"$name extract")(p.extract(ExtractText))
      }
    }
  }
}
