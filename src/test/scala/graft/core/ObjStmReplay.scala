package graft.core

/** Dev replay for the LENIENT ObjStm mutation fuzz (LenientSpec "ObjStm
  * MUTATION" — MutProbe replays the same seed-14 raw base under STRICT).
  * Usage: Test/runMain graft.core.ObjStmReplay <index> [raw|perm|flate]
  */
object ObjStmReplay {
  def main(args: Array[String]): Unit = {
    val target = args(0).toInt
    val (base, seed) =
      if (args.length > 1 && args(1) == "flate")
        (graft.pipeline.MiniPdf.synthesizeObjStm("objstm mutation fuzz target words",
          compress = true), 16)
      else if (args.length > 1 && args(1) == "perm")
        (graft.pipeline.MiniPdf.synthesizeObjStm("objstm mutation fuzz target words",
          memberOrder = Seq(4, 2, 0, 3, 1), sep = "", firstPad = 3, compress = false), 15)
      else
        (graft.pipeline.MiniPdf.synthesizeObjStm("objstm mutation fuzz target words",
          compress = false), 14)
    val rnd = new scala.util.Random(seed)
    (0 to target).foreach { i =>
      val m = base.clone()
      val flips = (0 to rnd.nextInt(2)).map { _ =>
        val pos = rnd.nextInt(m.length)
        val v = rnd.nextInt(256).toByte
        val old = m(pos); m(pos) = v; (pos, old, v)
      }
      if (i == target) {
        println("flips: " + flips.map { case (p, o, v) =>
          f"pos=$p old=0x${o & 0xff}%02x new=0x${v & 0xff}%02x" }.mkString(", "))
        try println("ok: " + Pdf.lenient(m).extract(ExtractText))
        catch { case e: Throwable => e.printStackTrace() }
      }
    }
  }
}
