package graft.core.extract

/** Char-span [start,end) into the ORIGINAL raw payload. Spans always index
  * the untouched input so they survive normalization/cleaning. */
final case class Span(start: Int, end: Int)

/** Result of per-turn payload extraction: cleaned main-content text plus the
  * raw-payload spans the text was drawn from (one per retained block/line). */
final case class Extracted(text: String, spans: Vector[Span])

object Extracted {
  val empty: Extracted = Extracted("", Vector.empty)
}
