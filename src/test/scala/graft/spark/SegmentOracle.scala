package graft.spark

import graft.core.extract.Extractor
import graft.core.seg.Demarcator
import graft.gen.SyntheticTranscripts
import graft.pipeline.Pipeline
import graft.schema.ConvSegment

/** THE sequential single-threaded oracle every distributed route is held
  * to: core kernels applied conv-by-conv in turn order. One shared
  * implementation so PipelineSpec and RouteEquivalenceSpec can never
  * assert two divergent contracts. */
object SegmentOracle {
  def segments(seed: Long, convIdx: Long): Vector[ConvSegment] = {
    val turns = SyntheticTranscripts.turnsFor(seed, convIdx)
    // safeExtract, not extract: the corpus deterministically carries
    // decode-corrupted (U+FFFD) parser turns, which quarantine to an empty
    // page — the oracle must hold routes to the same failure isolation.
    val pages = turns.sortBy(_.turn_idx).map(t => Extractor.safeExtract(t.tool, t.text)._1.text)
    val rules = SyntheticTranscripts.rulesFor(seed, convIdx).map(Pipeline.toCoreRule)
    val cid = SyntheticTranscripts.convId(convIdx)
    Demarcator.demarcate(pages.toVector, rules).map { r =>
      ConvSegment(cid, r.DocReceivedId.getOrElse(0L), r.FromPageNumber, r.ToPageNumber,
        r.FileNumber.getOrElse(""), r.DocumentTypeId.getOrElse(""),
        r.UploadDataSheetId.getOrElse(0L), r.TotalNumberOfpages, r.NoOfPages,
        r.Sequence.getOrElse(""), r.SessionId.getOrElse(""))
    }
  }
}
