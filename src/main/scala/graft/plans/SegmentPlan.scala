package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, SortOrder}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.extract.Extractor
import graft.core.seg.Rule
import graft.pipeline.Pipeline
import graft.schema.{ConvSegment, Turn}

/** The segmentation fold as a FIRST-CLASS Catalyst operator — the brief's
  * option (c): a custom `LogicalPlan` node, a `SparkStrategy`, and a
  * physical `SparkPlan` registered through `SparkSessionExtensions` /
  * `experimental.extraStrategies`.
  *
  * The point of doing it at this layer (vs the `mapPartitions` pipeline,
  * which stays the production default): the physical node DECLARES its
  * needs — `requiredChildDistribution = ClusteredDistribution(conv_id)`,
  * `requiredChildOrdering = (conv_id, turn_idx)` — and Catalyst's
  * `EnsureRequirements` plans the exchange + sort. If the input is already
  * bucketed/sorted by `conv_id` (Iceberg/bucketed tables at 10^12 turns),
  * the optimizer elides the shuffle entirely — something a hand-rolled
  * `repartition().sortWithinPartitions()` can never do, because it is
  * unconditional. Semantics are identical to [[Pipeline.segmentFused]]
  * (asserted in PlanSpec).
  */
object SegmentPlans {

  /** Fresh output attributes in [[ConvSegment]] field order. */
  def segmentOutput(): Seq[Attribute] = Seq(
    AttributeReference("conv_id", StringType, nullable = false)(),
    AttributeReference("DocReceivedId", LongType, nullable = false)(),
    AttributeReference("FromPageNumber", IntegerType, nullable = false)(),
    AttributeReference("ToPageNumber", IntegerType, nullable = false)(),
    AttributeReference("FileNumber", StringType, nullable = false)(),
    AttributeReference("DocumentTypeId", StringType, nullable = false)(),
    AttributeReference("UploadDataSheetId", LongType, nullable = false)(),
    AttributeReference("TotalNumberOfpages", IntegerType, nullable = false)(),
    AttributeReference("NoOfPages", IntegerType, nullable = false)(),
    AttributeReference("Sequence", StringType, nullable = false)(),
    AttributeReference("SessionId", StringType, nullable = false)())

  /** Dataset-API entry: project the needed columns, wrap the child plan in
    * the logical operator, ensure the strategy is registered, and rebuild a
    * DataFrame. With `stats` set, per-partition (turns in, segments out,
    * extraction errors) accumulate inside the operator's single pass —
    * same lineage contract as [[Pipeline.segmentFused]]. */
  def segment(turns: org.apache.spark.sql.Dataset[Turn],
              rulesFor: String => Seq[Rule],
              stats: Option[graft.pipeline.PartitionStatsAcc] = None): org.apache.spark.sql.DataFrame = {
    val spark = turns.sparkSession
    if (!spark.experimental.extraStrategies.contains(SegmentStrategy))
      spark.experimental.extraStrategies = spark.experimental.extraStrategies :+ SegmentStrategy
    val child = turns.select("conv_id", "turn_idx", "tool", "text")
      .queryExecution.analyzed
    org.apache.spark.sql.classic.GraftDatasetBridge.ofRows(
      spark, SegmentConversations(child, rulesFor, stats))
  }
}

/** Logical whole-operator node: one conversation in → its segment rows out.
  * `output` rides in the constructor so `copy()` keeps expr ids stable. */
final case class SegmentConversations(
    child: LogicalPlan,
    rulesFor: String => Seq[Rule],
    lineageStats: Option[graft.pipeline.PartitionStatsAcc] = None,
    output: Seq[Attribute] = SegmentPlans.segmentOutput()
) extends UnaryNode {
  // the node GENERATES its output (it is not derived from child attrs) —
  // without this, CheckAnalysis reports the segment columns as missing
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)
  override protected def withNewChildInternal(newChild: LogicalPlan): SegmentConversations =
    copy(child = newChild)
}

/** Planner rule: logical node → physical node. */
object SegmentStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case s: SegmentConversations =>
      SegmentExec(s.output, s.rulesFor, s.lineageStats, planLater(s.child)) :: Nil
    case _ => Nil
  }
}

/** Physical operator. Declares clustering + ordering requirements and runs
  * the same streaming one-conversation-at-a-time fold as the pipeline
  * (constant memory beyond one conversation). */
final case class SegmentExec(
    output: Seq[Attribute],
    rulesFor: String => Seq[Rule],
    lineageStats: Option[graft.pipeline.PartitionStatsAcc],
    child: SparkPlan
) extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  private def ord(name: String): Int = child.output.indexWhere(_.name == name)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(child.output(ord("conv_id")))) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(child.output(ord("conv_id")), Ascending),
      SortOrder(child.output(ord("turn_idx")), Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val (ci, ti, to, te) = (ord("conv_id"), ord("turn_idx"), ord("tool"), ord("text"))
    val rules = rulesFor
    val acc = lineageStats
    val types = output.map(_.dataType).toArray
    child.execute().mapPartitions { it =>
      // downstream consumers require UnsafeRow; the projection is created
      // per partition (codegen'd, not serializable)
      val toUnsafe = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(types)
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var in = 0L
      var out = 0L
      var errs = 0L
      for (a <- acc; tc <- Option(org.apache.spark.TaskContext.get()))
        tc.addTaskCompletionListener[Unit](_ => a.add((pid, in, out, errs)))
      // copy out of the reused UnsafeRow before buffering
      val tuples = it.map { row =>
        in += 1
        (row.getUTF8String(ci).toString, row.getInt(ti),
          row.getUTF8String(to).toString, row.getUTF8String(te).toString)
      }
      new Pipeline.GroupFold(tuples, rules,
        (tool, text) => {
          val (ex, err) = Extractor.safeExtract(tool, text)
          if (err) errs += 1
          ex.text
        })
        .map { s: ConvSegment =>
          out += 1
          toUnsafe(new GenericInternalRow(Array[Any](
            UTF8String.fromString(s.conv_id), s.DocReceivedId, s.FromPageNumber,
            s.ToPageNumber, UTF8String.fromString(s.FileNumber),
            UTF8String.fromString(s.DocumentTypeId), s.UploadDataSheetId,
            s.TotalNumberOfpages, s.NoOfPages, UTF8String.fromString(s.Sequence),
            UTF8String.fromString(s.SessionId)))): InternalRow
        }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SegmentExec =
    copy(child = newChild)
}
