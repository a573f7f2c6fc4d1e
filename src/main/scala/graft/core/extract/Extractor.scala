package graft.core.extract

import graft.core.html.BoilerplateExtractor
import graft.core.pdf.PdfLayout

/** Per-turn payload extraction dispatched on the `tool` column — the analog
  * of the reference's per-page render+OCR (`ocr_processor.py:242-270`),
  * replaced (per the north star) with deterministic from-scratch parsers:
  *
  *  - `tool = "html"` → pushdown tokenizer + text-density boilerplate strip
  *  - `tool = "pdf"`  → content-stream layout parse (y-cluster, reading order)
  *  - anything else   → tool-output passthrough (identity, full-payload span)
  *
  * Pure `String => Extracted`; per-turn failure isolation (reference
  * `ocr_processor.py:237-239`: failed page ⇒ "") lives in [[safeExtract]].
  */
object Extractor {

  val ToolHtml = "html"
  val ToolPdf = "pdf"

  /** Upstream decode-corruption sentinel. A U+FFFD replacement character in
    * a payload means the transcript decoder already lost bytes before the
    * engine saw the turn — the deterministic analog of a page the reference
    * cannot render (failed page ⇒ "" + error count,
    * `ocr_processor.py:237-239`). Extraction REFUSES such payloads instead
    * of emitting silently-truncated text; [[safeExtract]] converts the
    * refusal into the quarantine row (empty text, error flag) that the
    * per-partition lineage error counters and the driver gate observe. The
    * guard is one indexOf scan — same cost class as the extraction pass
    * that would follow, negligible against it at any corpus size. */
  val CorruptMarker = '�'

  def extract(tool: String, payload: String): Extracted = {
    if (payload == null || payload.isEmpty) Extracted.empty
    else if (payload.indexOf(CorruptMarker) >= 0)
      throw new IllegalArgumentException(
        s"corrupt payload: U+FFFD decode sentinel at index ${payload.indexOf(CorruptMarker)}")
    else
      tool match {
        case ToolHtml => BoilerplateExtractor.extract(payload)
        case ToolPdf => PdfLayout.extract(payload)
        case _ => Extracted(payload, Vector(Span(0, payload.length)))
      }
  }

  /** Failure-isolated variant: any kernel error yields an empty extraction
    * plus an error flag for the lineage counters (north rule: per-partition
    * extraction error counts). */
  def safeExtract(tool: String, payload: String): (Extracted, Boolean) =
    try (extract(tool, payload), false)
    catch { case scala.util.control.NonFatal(_) => (Extracted.empty, true) }
}
