package graft.core.xml

import graft.core.seg.SegmentRow

/** Renders the segment-row set as the reference's XML payload
  * (`/root/reference/data_models.py:7-32`): `<SubDocumentDetails>` root, one
  * `<SubDocumentRow>` per row, one child per field in row order, `None → ""`,
  * lxml `pretty_print` layout (2-space indent, leaf text inline, empty text
  * self-closing, `&<>` escaped, trailing newline).
  *
  * Exposed as a plain `String` function so the Spark layer can surface it as
  * a column (`udf` / map) when an XML output surface is wanted.
  */
object SubDocXml {

  private def esc(s: String): String = {
    if (s.indexOf('&') < 0 && s.indexOf('<') < 0 && s.indexOf('>') < 0) s
    else s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
  }

  private def fields(r: SegmentRow): Seq[(String, String)] = Seq(
    "DocReceivedId" -> r.DocReceivedId.map(_.toString).getOrElse(""),
    "FromPageNumber" -> r.FromPageNumber.toString,
    "ToPageNumber" -> r.ToPageNumber.toString,
    "FileNumber" -> r.FileNumber.getOrElse(""),
    "DocumentTypeId" -> r.DocumentTypeId.getOrElse(""),
    "UploadDataSheetId" -> r.UploadDataSheetId.map(_.toString).getOrElse(""),
    "TotalNumberOfpages" -> r.TotalNumberOfpages.toString,
    "NoOfPages" -> r.NoOfPages.toString,
    "Sequence" -> r.Sequence.getOrElse(""),
    "SessionId" -> r.SessionId.getOrElse("")
  )

  def render(rows: Seq[SegmentRow]): String = {
    val sb = new StringBuilder(64 + rows.length * 256)
    sb.append("<SubDocumentDetails>\n")
    rows.foreach { r =>
      sb.append("  <SubDocumentRow>\n")
      fields(r).foreach { case (k, v) =>
        if (v.isEmpty) sb.append("    <").append(k).append("/>\n")
        else
          sb.append("    <").append(k).append('>').append(esc(v))
            .append("</").append(k).append(">\n")
      }
      sb.append("  </SubDocumentRow>\n")
    }
    sb.append("</SubDocumentDetails>\n")
    sb.toString
  }
}
