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

  def extract(tool: String, payload: String): Extracted = {
    if (payload == null || payload.isEmpty) Extracted.empty
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
