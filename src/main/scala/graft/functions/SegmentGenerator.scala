package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.core.seg.{Demarcator, Rule}

/** `segment_rows(turns, rules)` — the demarcation fold
  * (`/root/reference/ocr_processor.py:439-507`) exposed as a SQL
  * table-valued Generator: one conversation's turns in, one row per rule
  * out — the UDTF leg of the UDx surface next to the scalar expressions
  * (`py_*`) and the custom aggregate (`kmv_kth`).
  *
  *  - `turns`: `ARRAY<STRUCT<turn_idx INT, text STRING>>` — sorted here by
  *    `turn_idx` (the stable-turn-ordering invariant is enforced inside
  *    the function, so `collect_list` non-determinism can't corrupt it).
  *  - `rules`: array of structs carrying the reference rule fields
  *    (`Input_Sample1.json:12-25` names, resolved BY NAME so any
  *    field order works).
  *
  * Used as `SELECT conv_id, segment_rows(...).*` after a `groupBy` —
  * Catalyst plans the standard `Generate` node over the aggregated
  * arrays. The eval path is `CodegenFallback` like every generator; the
  * per-row work is the same core fold the production `flatMapGroups`
  * path runs, so SQL users get byte-identical segments. */
case class SegmentRowsGenerator(turns: Expression, rules: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(turns, rules)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SegmentRowsGenerator =
    copy(turns = newChildren(0), rules = newChildren(1))

  override def elementSchema: StructType = StructType(Seq(
    StructField("DocReceivedId", LongType),
    StructField("FromPageNumber", IntegerType, nullable = false),
    StructField("ToPageNumber", IntegerType, nullable = false),
    StructField("FileNumber", StringType),
    StructField("DocumentTypeId", StringType),
    StructField("UploadDataSheetId", LongType),
    StructField("TotalNumberOfpages", IntegerType, nullable = false),
    StructField("NoOfPages", IntegerType, nullable = false),
    StructField("Sequence", StringType),
    StructField("SessionId", StringType)))

  private def structFields(e: Expression): Option[StructType] = e.dataType match {
    case ArrayType(st: StructType, _) => Some(st)
    case _ => None
  }

  private def idxOf(s: StructType, f: String): Option[Int] = {
    val i = s.fieldNames.indexOf(f)
    if (i < 0) None else Some(i)
  }

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    val turnsOk = structFields(turns).exists { s =>
      idxOf(s, "turn_idx").exists(i => s(i).dataType == IntegerType) &&
        idxOf(s, "text").exists(i => s(i).dataType == StringType)
    }
    if (!turnsOk)
      return TypeCheckResult.TypeCheckFailure(
        "segment_rows: first arg must be ARRAY<STRUCT<turn_idx INT, text STRING>>")
    val need = Seq("DocumentTypeID", "StartingIdentifier", "StartingIdentifierPlus1",
      "EndingIdentifier", "EndingIdentifierMinus1", "NoOfPages", "Occurence",
      "StartingMinusN", "EndingMinusN", "Sequence")
    structFields(rules) match {
      case Some(s) =>
        val missing = need.filterNot(f => idxOf(s, f).isDefined)
        if (missing.isEmpty) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"segment_rows: rules struct is missing fields: ${missing.mkString(", ")}")
      case None => TypeCheckResult.TypeCheckFailure(
        "segment_rows: second arg must be ARRAY<STRUCT<rule fields>>")
    }
  }

  private lazy val turnsSchema = structFields(turns).get
  private lazy val tIdx = idxOf(turnsSchema, "turn_idx").get
  private lazy val tText = idxOf(turnsSchema, "text").get
  private lazy val rulesSchema = structFields(rules).get

  private def str(row: InternalRow, s: StructType, f: String, dflt: String): String =
    idxOf(s, f) match {
      case Some(i) if !row.isNullAt(i) && s(i).dataType == StringType =>
        row.getUTF8String(i).toString
      case _ => dflt
    }
  private def int(row: InternalRow, s: StructType, f: String): Int =
    idxOf(s, f) match {
      case Some(i) if !row.isNullAt(i) => s(i).dataType match {
        case IntegerType => row.getInt(i)
        case LongType => row.getLong(i).toInt
        case _ => 0
      }
      case _ => 0
    }
  private def longOpt(row: InternalRow, s: StructType, f: String): Option[Long] =
    idxOf(s, f) match {
      case Some(i) if !row.isNullAt(i) => s(i).dataType match {
        case LongType => Some(row.getLong(i))
        case IntegerType => Some(row.getInt(i).toLong)
        case _ => None
      }
      case _ => None
    }
  private def strOpt(row: InternalRow, s: StructType, f: String): Option[String] =
    idxOf(s, f) match {
      case Some(i) if !row.isNullAt(i) && s(i).dataType == StringType =>
        Some(row.getUTF8String(i).toString)
      case _ => None
    }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val tArr = turns.eval(input).asInstanceOf[ArrayData]
    val rArr = rules.eval(input).asInstanceOf[ArrayData]
    if (tArr == null || rArr == null) return Nil

    val pages = Array.tabulate(tArr.numElements()) { i =>
      val row = tArr.getStruct(i, turnsSchema.length)
      val idx = if (row.isNullAt(tIdx)) Int.MaxValue else row.getInt(tIdx)
      val text = if (row.isNullAt(tText)) "" else row.getUTF8String(tText).toString
      (idx, text)
    }.sortBy(_._1).map(_._2).toIndexedSeq

    val coreRules = (0 until rArr.numElements()).map { i =>
      val row = rArr.getStruct(i, rulesSchema.length)
      Rule(
        documentTypeId = str(row, rulesSchema, "DocumentTypeID", ""),
        documentTypeName = str(row, rulesSchema, "DocumentTypeName", ""),
        startingIdentifier = str(row, rulesSchema, "StartingIdentifier", ""),
        startingIdentifierPlus1 = str(row, rulesSchema, "StartingIdentifierPlus1", ""),
        endingIdentifier = str(row, rulesSchema, "EndingIdentifier", ""),
        endingIdentifierMinus1 = str(row, rulesSchema, "EndingIdentifierMinus1", ""),
        noOfPages = int(row, rulesSchema, "NoOfPages"),
        occurence = int(row, rulesSchema, "Occurence"),
        startingMinusN = str(row, rulesSchema, "StartingMinusN", " "),
        endingMinusN = str(row, rulesSchema, "EndingMinusN", " "),
        sequence = strOpt(row, rulesSchema, "Sequence"),
        docReceivedId = longOpt(row, rulesSchema, "DocReceivedId"),
        firmFile = strOpt(row, rulesSchema, "FirmFile"),
        uploadDatasheetId = longOpt(row, rulesSchema, "UploadDatasheetid"),
        sessionId = strOpt(row, rulesSchema, "SessionId"))
    }

    Demarcator.demarcate(pages, coreRules).map { r =>
      InternalRow(
        r.DocReceivedId.map(Long.box).orNull,
        r.FromPageNumber,
        r.ToPageNumber,
        r.FileNumber.map(UTF8String.fromString).orNull,
        r.DocumentTypeId.map(UTF8String.fromString).orNull,
        r.UploadDataSheetId.map(Long.box).orNull,
        r.TotalNumberOfpages,
        r.NoOfPages,
        r.Sequence.map(UTF8String.fromString).orNull,
        r.SessionId.map(UTF8String.fromString).orNull)
    }
  }

  override def prettyName: String = "segment_rows"
}
