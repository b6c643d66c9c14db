package graft.tools

import graft.core.{Crypt, ExtractText, Pdf}
import graft.pipeline.MiniPdf

/** Microbench: where does q_pdf_encrypted_lenient's per-doc time go?
  * Usage: CryptProbe [n]
  */
object CryptProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 5000
    val text = "the quick brown fox jumps over the lazy dog " * 12
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2fs for $n")
    }
    // warm
    (0 until 500).foreach(i => Pdf.lenient(MiniPdf.synthesizeEncrypted(text + i, 3)).extract(ExtractText))
    time("synthesize r3")((0 until n).foreach(i => MiniPdf.synthesizeEncrypted(text + i, 3)))
    time("synthesize r2")((0 until n).foreach(i => MiniPdf.synthesizeEncrypted(text + i, 2)))
    val pdfs3 = (0 until n).map(i => MiniPdf.synthesizeEncrypted(text + i, 3)).toArray
    time("extract r3")(pdfs3.foreach(p => Pdf.lenient(p).extract(ExtractText)))
    time("ownerEntry r3")((0 until n).foreach(_ => Crypt.ownerEntry(16, 3)))
    time("fileKey r3")((0 until n).foreach(i =>
      Crypt.fileKey(new Array[Byte](32), -1, Array.fill(16)(i.toByte), 16, 3)))
    val plain = (0 until n).map(i => MiniPdf.synthesize(text + i)).toArray
    time("extract plain strict")(plain.foreach(p => Pdf(p).extract(ExtractText)))
    val lenientPlain = (0 until n).map(i => MiniPdf.synthesizeXrefStream(text + i)).toArray
    time("extract xrefstream lenient")(lenientPlain.foreach(p => Pdf.lenient(p).extract(ExtractText)))
  }
}

object Hash2BProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 1000
    val salt = Array.tabulate(8)(_.toByte)
    // warm
    (0 until 50).foreach(i => graft.core.Crypt.hash2B(Array.emptyByteArray, Array(i.toByte), Array.emptyByteArray))
    val t0 = System.nanoTime()
    (0 until n).foreach(i => graft.core.Crypt.hash2B(Array.emptyByteArray,
      Array(i.toByte, (i >> 8).toByte, 0, 0, 0, 0, 0, 0), Array.emptyByteArray))
    println(f"hash2B: ${(System.nanoTime() - t0) / 1e6 / n}%.3f ms each over $n")
    val t1 = System.nanoTime()
    (0 until n).foreach(i => graft.pipeline.MiniPdf.synthesizeEncrypted("text " + i, 6))
    println(f"synthesizeV5: ${(System.nanoTime() - t1) / 1e6 / n}%.3f ms each over $n")
  }
}
