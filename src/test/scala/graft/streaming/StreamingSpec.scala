package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.{MiniPdf, SparkTestSession, SynthGen, Turn}

class StreamingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def turn(conv: String, idx: Int, text: String, tool: String, tsSec: Long): Turn =
    Turn(conv, idx, "user", text, tool, new java.sql.Timestamp(tsSec * 1000))

  test("streaming extraction matches batch extraction row-for-row") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val body = SynthGen.prose(11L, 8, 20)
    val rows = Seq(
      turn("c1", 0, body, "plain", 100),
      turn("c1", 1, MiniPdf.synthesizeBase64(body), "pdf-b64", 160),
      turn("c2", 0, SynthGen.wrapHtml(body), "html", 200),
      turn("c2", 1, "!!!bad base64", "pdf-b64", 260)
    )
    val q = StreamingExtract.extractStream(input.toDS()).writeStream
      .format("memory").queryName("stream_out").outputMode(OutputMode.Append).start()
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("stream_out")
      .orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "extracted_text", "payload_kind", "error").collect()
    val batch = graft.pipeline.ExtractJob.extract(rows.toDS(), 2)
      .orderBy("conv_id", "turn_idx")
      .select("conv_id", "turn_idx", "extracted_text", "payload_kind", "error").collect()
    assert(streamed.toSeq == batch.toSeq)
    assert(streamed.count(_.getAs[String]("error") != null) == 1) // the poison row
  }

  test("windowed metrics aggregate per payload kind with watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Turn]
    val body = "some plain text content"
    val q = StreamingExtract.windowedMetrics(input.toDS(), "1 minute", "10 minutes")
      .writeStream.format("memory").queryName("metrics_out")
      .outputMode(OutputMode.Append).start()
    // two windows of plain turns, then advance the watermark past them
    input.addData(turn("c1", 0, body, "plain", 0), turn("c1", 1, body, "plain", 30))
    q.processAllAvailable()
    input.addData(turn("c1", 2, body, "plain", 90))
    q.processAllAvailable()
    input.addData(turn("c1", 3, body, "plain", 5000)) // advances watermark, closes windows
    q.processAllAvailable()
    q.stop()
    val out = spark.table("metrics_out").select("payload_kind", "n_turns").collect()
    assert(out.nonEmpty)
    assert(out.map(_.getAs[Long]("n_turns")).sum == 3) // first two windows emitted
  }
}
