package graft.core

import java.nio.charset.StandardCharsets.UTF_8

/** Shared harness for the live-reference differential suites (round-6 review:
  * three near-identical spawn/compare implementations had already drifted —
  * one had a hang guard, one read stdout on the calling thread so a silent
  * hang would block the suite forever). ONE implementation: stdout drains on
  * a background thread, waitFor carries the timeout, a hung binary is killed
  * and reported as [[RefRun.Hung]] for the caller to fail or skip-and-count.
  */
object RefBinary {

  val bin = "/tmp/refbuild/target/release/pdfrust"
  def present: Boolean = new java.io.File(bin).exists

  sealed trait RefRun
  final case class Done(rc: Int, stdout: String) extends RefRun
  case object Hung extends RefRun

  def run(pdf: Array[Byte], mode: String = "text", timeoutSec: Long = 20): RefRun = {
    val f = java.nio.file.Files.createTempFile("graftref", ".pdf")
    java.nio.file.Files.write(f, pdf)
    try {
      val pb = new ProcessBuilder(bin, s"--$mode", f.toString)
      pb.redirectError(ProcessBuilder.Redirect.DISCARD)
      val p = pb.start()
      // drain stdout off-thread: a blocking readAllBytes on the calling
      // thread would make the waitFor timeout below unreachable
      val outF = scala.concurrent.Future(
        new String(p.getInputStream.readAllBytes(), UTF_8))(
        scala.concurrent.ExecutionContext.global)
      if (!p.waitFor(timeoutSec, java.util.concurrent.TimeUnit.SECONDS)) {
        p.destroyForcibly()
        Hung
      } else Done(p.exitValue(), scala.concurrent.Await.result(
        outF, scala.concurrent.duration.Duration(10, "s")))
    } finally java.nio.file.Files.delete(f)
  }

  /** Strip the reference's unknown-operator println side effect (a stdout
    * diagnostic emitted during parsing, not part of the extract output —
    * probe-verified round 6).
    */
  def stripDiag(s: String): String =
    s.split("\n", -1).filterNot(_.startsWith("Content token operator ")).mkString("\n")

  private val cmapRe = """(?s)cmap: \{(.*?)\} \}""".r
  // value = one Rust char Debug form: a \u{..} escape (deep cmap fuzz caught
  // the narrower `\\.` failing to match these, leaving HashMap order
  // unnormalized), a single named escape, or one literal non-quote char
  private val entryRe = """(\d+): ('(?:\\u\{[0-9a-fA-F]{1,6}\}|\\.|[^'\\])')""".r

  /** Order-normalize font-mode output for comparison: ToUnicodeCMap Debug
    * entries to numeric key order and blank-line-separated font blocks to
    * sorted order — the reference iterates Rust HashMaps whose per-process
    * seed randomizes both (empirically proven, see RefGoldenSpec), so font
    * order is UNVERIFIABLE by construction and the block SET is the gated
    * contract. Unlike RefGoldenSpec's strict fixture normalizer (which fails
    * loudly on an unparseable cmap body), a body the entry regex cannot fully
    * reconstruct — possible on MUTATED documents — is left as-is on both
    * sides: same treatment, so true divergences still surface.
    */
  def normalizeFont(s: String): String = {
    val cm = cmapRe.replaceAllIn(s, m => {
      val body = m.group(1)
      val entries = entryRe.findAllMatchIn(body)
        .map(e => (e.group(1).toInt, e.group(2))).toSeq
      val rebuilt = entries.map { case (k, v) => s"$k: $v" }.mkString(", ")
      java.util.regex.Matcher.quoteReplacement(
        if (rebuilt.length != body.length) m.matched
        else "cmap: {" + entries.sortBy(_._1).map { case (k, v) => s"$k: $v" }
          .mkString(", ") + "} }")
    })
    cm.split("\n\n", -1).sorted.mkString("\n\n")
  }

  /** Behavior-parity verdict for one document + mode: Right(()) on parity,
    * Left(message) on divergence; a hung reference returns Left with a
    * distinguishable message unless `hangIsSkip`. `normalize` is applied to
    * BOTH outputs before comparison (font mode passes [[normalizeFont]];
    * byte-exact modes leave it identity).
    */
  def parity(name: String, pdf: Array[Byte], mode: ExtractMode, flag: String,
             hangIsSkip: Boolean = false,
             normalize: String => String = identity): Either[String, Boolean] = {
    run(pdf, flag) match {
      case Hung =>
        if (hangIsSkip) Right(false)
        else Left(s"$name --$flag: reference binary hung")
      case Done(rc, refOut) =>
        val oursE =
          try Right(Pdf(pdf).extract(mode) + "\n")
          catch {
            case e: PdfParseException  => Left(e: Throwable)
            case e: StackOverflowError => Left(e: Throwable)
          }
        (rc, oursE) match {
          case (0, Right(o)) =>
            if (normalize(o) == normalize(stripDiag(refOut))) Right(true)
            else Left(s"$name --$flag: outputs diverge " +
              s"(ref=${normalize(stripDiag(refOut)).take(60)} ours=${normalize(o).take(60)})")
          case (n, Left(_)) if n != 0 => Right(true) // both refuse — parity
          case (0, Left(e)) => Left(s"$name --$flag: reference succeeds, strict throws: $e")
          case (n, Right(o)) =>
            Left(s"$name --$flag: reference exits $n, strict returns ${o.take(60)}")
        }
    }
  }
}
