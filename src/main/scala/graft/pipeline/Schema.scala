package graft.pipeline

import java.sql.Timestamp

/** North-rule table shapes — BASELINE.json input_hint + SURVEY §1.2. */

/** Input row: one transcript turn. `tool` tags the payload kind
  * (pdf-b64 | html | plain); `text` carries the payload (base64 for PDF bytes).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp
)

final case class SpanRow(op: String, start: Int, end: Int)

/** Output row: per-turn extracted text + character-offset spans. `error` carries
  * the reference's panic message for poison payloads instead of failing the stage.
  */
final case class ExtractedTurn(
    conv_id: String,
    turn_idx: Int,
    extracted_text: String,
    spans: Seq[SpanRow],
    payload_kind: String,
    error: String
)

/** Golden fixture row for the equality gate (FIXTURES.md §2). */
final case class Golden(
    conv_id: String,
    turn_idx: Int,
    expected_text: String,
    gate: String // "exact" | "smoke"
)

/** Per-partition checkpoint manifest (SURVEY §1.2 / P8). `wall_ms` is this
  * shard's byte-proportional share of its wave's wall time (waves write
  * several shards in one pass, so exact per-shard wall does not exist; the
  * shares of one wave sum EXACTLY to the wave wall). `wave_id` groups the
  * shards of one wave, so the wave wall is sum(wall_ms) group by wave_id.
  */
final case class PartManifest(
    part_id: Int,
    conv_salt: Int,
    rows: Long,
    bytes: Long,
    wall_ms: Long,
    wave_id: Int,
    status: String
)
