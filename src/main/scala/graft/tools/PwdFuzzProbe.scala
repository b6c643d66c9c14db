package graft.tools

import graft.core.{ExtractText, Pdf, PdfParseException}
import graft.pipeline.MiniPdf

/** Dev probe: brute-force the passworded round-trip property deterministically
  * to reproduce the rare ScalaCheck counterexample (round 6). Prints the
  * first failing (seed, revision, user, owner) with hex bytes and which of
  * the three conditions broke.
  */
object PwdFuzzProbe {
  def main(args: Array[String]): Unit = {
    // explicit-pair mode: `runMain graft.tools.PwdFuzzProbe pair <userHex> <ownerHex>`
    if (args.length == 3 && args(0) == "pair") {
      def unhex(s: String): Array[Byte] = s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
      val (user, owner) = (unhex(args(1)), unhex(args(2)))
      for (r <- Seq(3, 4, 6)) {
        val text = "property fuzz body"
        val pdf = MiniPdf.synthesizeEncrypted(text, r, userPwd = user, ownerPwd = owner)
        val wrong = user.clone(); wrong(0) = (wrong(0) ^ 0x5a).toByte
        def open(p: Array[Byte]): String =
          try { if (Pdf.lenient(pdf, p).extract(ExtractText) == text) "OK" else "GARBLED" }
          catch { case e: PdfParseException => s"throws(${e.getMessage.take(50)})" }
        println(s"r=$r user=${open(user)} owner=${open(owner)} wrong=${open(wrong)}")
      }
      return
    }
    val maxSeed = if (args.nonEmpty) args(0).toInt else 2000
    val revs = Seq(3, 4, 6)
    var found = 0
    var seed = 0
    while (seed < maxSeed && found < 5) {
      val rnd = new scala.util.Random(seed)
      // mirror ScalaCheck chooseNum's edge bias: 1 and 255 (and small values)
      // are heavily over-represented vs a uniform draw
      def biasedByte(): Byte = rnd.nextInt(4) match {
        case 0 => 1
        case 1 => 255.toByte
        case _ => (1 + rnd.nextInt(255)).toByte
      }
      def biasedLen(): Int = rnd.nextInt(4) match {
        case 0 => 1
        case 1 => 40
        case _ => 1 + rnd.nextInt(40)
      }
      def pwd(): Array[Byte] = Array.fill(biasedLen())(biasedByte())
      val user = pwd()
      val owner = pwd()
      for (r <- revs) {
        val text = "property fuzz body"
        val pdf = MiniPdf.synthesizeEncrypted(text, r, userPwd = user, ownerPwd = owner)
        def hex(b: Array[Byte]) = b.map(x => f"${x & 0xff}%02x").mkString
        def check(label: String)(f: => Boolean): Unit = {
          val ok = try f catch {
            case e: Throwable =>
              println(s"FAIL r=$r seed=$seed $label THREW ${e.getClass.getSimpleName}: ${e.getMessage}")
              println(s"  user=${hex(user)}"); println(s"  owner=${hex(owner)}")
              found += 1
              return
          }
          if (!ok) {
            println(s"FAIL r=$r seed=$seed $label")
            println(s"  user=${hex(user)}"); println(s"  owner=${hex(owner)}")
            found += 1
          }
        }
        check("viaUser")(Pdf.lenient(pdf, user).extract(ExtractText) == text)
        check("viaOwner")(Pdf.lenient(pdf, owner).extract(ExtractText) == text)
        check("wrongFails") {
          val wrong = user.clone(); wrong(0) = (wrong(0) ^ 0x5a).toByte
          try { Pdf.lenient(pdf, wrong).extract(ExtractText); false }
          catch { case e: PdfParseException => e.getMessage.contains("password") }
        }
      }
      seed += 1
    }
    println(s"done: $found failures in $seed seeds x 3 revisions")
  }
}
