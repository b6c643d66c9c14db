package graft

import graft.core._

/** CLI parity with the reference binary (main.rs:11-39):
  *   PdfCli file.pdf              -> Text
  *   PdfCli --text|--chars|--font|--raw-content file.pdf
  * A user of `pdfrust <file>` can switch to `runMain graft.PdfCli <file>`.
  */
object PdfCli {
  def main(args: Array[String]): Unit = {
    val (mode, path) = args.length match {
      case 1 => (ExtractText, args(0))
      case 2 => (args(0) match {
        case "--text"        => ExtractText
        case "--chars"       => ExtractChars
        case "--font"        => ExtractFont
        case "--raw-content" => ExtractRawContent
        case f => sys.error(
          s"Invalid flag: $f\nPdfRust currently support:\n\t--text\t\tformatted text\n\t--chars\t\ttext character font and positionning\n\t--raw-content\traw pdf content\n\t--font\t\tfont analyzer")
      }, args(1))
      case _ => sys.error("CLI should have 2 or 3 arguments")
    }
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    println(Pdf(bytes).extract(mode))
  }
}
