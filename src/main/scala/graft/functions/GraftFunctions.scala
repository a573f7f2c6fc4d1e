package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.core.text.PyText

/** Static bridge for generated code: UTF8String in/out so the expressions
  * below stay inside whole-stage codegen (one static call per row, no
  * boxing, no virtual dispatch through the Expression tree at runtime). */
object PyTextCodegen {
  def normalize(s: UTF8String): UTF8String =
    UTF8String.fromString(PyText.normalize(s.toString))
  def pyLower(s: UTF8String): UTF8String =
    UTF8String.fromString(PyText.pyLower(s.toString))
  def countOccurrences(page: UTF8String, id: UTF8String): Int =
    PyText.countOccurrences(page.toString, id.toString)
  def containsOccurrence(page: UTF8String, id: UTF8String): Boolean =
    PyText.containsOccurrence(page.toString, id.toString)
}

/** `py_normalize_text(s)` — the reference's `normalize_text`
  * (`/root/reference/ocr_processor.py:273-275`, CPython `\s` semantics) as a
  * native codegen'd Catalyst expression: collapse every run of
  * Python-whitespace to one space and strip. */
case class PyNormalizeText(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    PyTextCodegen.normalize(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyTextCodegen.normalize($c)")
  override protected def withNewChildInternal(newChild: Expression): PyNormalizeText =
    copy(child = newChild)
  override def prettyName: String = "py_normalize_text"
}

/** `py_lower(s)` — CPython `str.lower()` (unconditional mapping incl.
  * U+0130, final-sigma handling) as a codegen'd expression. */
case class PyLower(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(input: Any): Any =
    PyTextCodegen.pyLower(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PyTextCodegen.pyLower($c)")
  override protected def withNewChildInternal(newChild: Expression): PyLower =
    copy(child = newChild)
  override def prettyName: String = "py_lower"
}

/** `py_count_occurrences(page, id)` — the reference's `count_occurrences`
  * (`ocr_processor.py:289-293`: non-overlapping, `re.IGNORECASE` simple
  * case folding) as a codegen'd expression. */
case class PyCountOccurrences(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(page: Any, id: Any): Any =
    PyTextCodegen.countOccurrences(page.asInstanceOf[UTF8String], id.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, i) => s"graft.functions.PyTextCodegen.countOccurrences($p, $i)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PyCountOccurrences =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "py_count_occurrences"
}

/** `py_contains(page, id)` — `py_count_occurrences(page, id) > 0` with an
  * early-exit scan: same fold tables, stops at the first hit. The target
  * of [[CountToContains]]'s algebraic rewrite. */
case class PyContainsOccurrence(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType, StringType)
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullIntolerant: Boolean = true
  override def nullSafeEval(page: Any, id: Any): Any =
    PyTextCodegen.containsOccurrence(page.asInstanceOf[UTF8String], id.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p, i) => s"graft.functions.PyTextCodegen.containsOccurrence($p, $i)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): PyContainsOccurrence =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "py_contains"
}

/** Algebraic rewrite rule — the optimizer-extension surface next to the
  * function injection and the planner strategy: a counting kernel used
  * only as an existence predicate is strength-reduced to the early-exit
  * containment scan. On a multi-MB page, `count > 0` pays a full
  * O(page·id) counting pass per row at 10^12 rows; `py_contains` stops at
  * the first hit. Null semantics are preserved exactly: both expressions
  * are null-intolerant over the same children, so three-valued logic
  * (including the `Not` forms) is unchanged. Cases with a non-trivial
  * literal or a cast simply don't fire — the rule only ever substitutes a
  * provably equivalent predicate. */
object CountToContains
    extends org.apache.spark.sql.catalyst.rules.Rule[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{EqualTo, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal, Not}

  private def isIntLit(e: Expression, v: Int): Boolean = e match {
    case Literal(x: Int, IntegerType) => x == v
    case _ => false
  }

  override def apply(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan) =
    plan.transformAllExpressions {
      // count > 0  /  count >= 1  /  0 < count  /  1 <= count
      case GreaterThan(c: PyCountOccurrences, l) if isIntLit(l, 0) =>
        PyContainsOccurrence(c.left, c.right)
      case GreaterThanOrEqual(c: PyCountOccurrences, l) if isIntLit(l, 1) =>
        PyContainsOccurrence(c.left, c.right)
      case LessThan(l, c: PyCountOccurrences) if isIntLit(l, 0) =>
        PyContainsOccurrence(c.left, c.right)
      case LessThanOrEqual(l, c: PyCountOccurrences) if isIntLit(l, 1) =>
        PyContainsOccurrence(c.left, c.right)
      // count = 0  (either side) — count is never negative
      case EqualTo(c: PyCountOccurrences, l) if isIntLit(l, 0) =>
        Not(PyContainsOccurrence(c.left, c.right))
      case EqualTo(l, c: PyCountOccurrences) if isIntLit(l, 0) =>
        Not(PyContainsOccurrence(c.left, c.right))
    }
}

/** `kmv_kth(h, k)` — the k-th smallest DISTINCT value of a 64-bit hash
  * column, the state of a KMV (k-minimum-values) distinct-count sketch
  * [Bar-Yossef et al. 2002]. Implemented as a `TypedImperativeAggregate`:
  * the ≤k-element sorted buffer is mergeable, so Spark plans it as
  * partial (map-side) + final aggregation — each of 10^12 rows touches a
  * bounded local buffer and only ≤k longs per partition cross the wire.
  * Returns NULL when fewer than k distinct values exist (caller falls
  * back to the exact small count). Unlike HLL++ the result is exactly
  * reproducible in any engine (`ORDER BY h LIMIT k`), so the sketch state
  * itself is cross-engine oracle-checkable. */
case class KmvKthSmallest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with ImplicitCastInputTypes
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {
  require(k >= 1, s"kmv_kth: k must be >= 1, got $k")

  override def inputTypes = Seq(org.apache.spark.sql.types.LongType)
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def trim(buf: java.util.TreeSet[java.lang.Long]): Unit =
    while (buf.size > k) buf.pollLast()

  override def update(
      buf: java.util.TreeSet[java.lang.Long],
      input: org.apache.spark.sql.catalyst.InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val l = v.asInstanceOf[Long]
      // skip values already above the current k-th minimum
      if (buf.size < k || l < buf.last()) { buf.add(l); trim(buf) }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other); trim(buf); buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) null else buf.last().longValue()

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buf.size)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKthSmallest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKthSmallest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvKthSmallest =
    copy(child = newChild)
  override def prettyName: String = "kmv_kth"
}

/** Function registration, two ways:
  *  - spark-submit: `--conf spark.sql.extensions=graft.functions.GraftExtensions`
  *  - existing session (tests, notebooks): `GraftFunctions.register(spark)`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // whole-operator segmentation (custom LogicalPlan → SparkPlan)
    ext.injectPlannerStrategy(_ => graft.plans.SegmentStrategy)
    // strength-reduce count-as-existence predicates to early-exit contains
    ext.injectOptimizerRule(_ => CountToContains)
  }
}

object GraftFunctions {
  type Builder = Seq[Expression] => Expression

  val descriptors: Seq[(String, ExpressionInfo, Builder)] = Seq(
    ("py_normalize_text",
      new ExpressionInfo(classOf[PyNormalizeText].getName, "py_normalize_text"),
      (args: Seq[Expression]) => PyNormalizeText(args.head)),
    ("py_lower",
      new ExpressionInfo(classOf[PyLower].getName, "py_lower"),
      (args: Seq[Expression]) => PyLower(args.head)),
    ("py_count_occurrences",
      new ExpressionInfo(classOf[PyCountOccurrences].getName, "py_count_occurrences"),
      (args: Seq[Expression]) => PyCountOccurrences(args(0), args(1))),
    ("py_contains",
      new ExpressionInfo(classOf[PyContainsOccurrence].getName, "py_contains"),
      (args: Seq[Expression]) => PyContainsOccurrence(args(0), args(1))),
    ("kmv_kth",
      new ExpressionInfo(classOf[KmvKthSmallest].getName, "kmv_kth"),
      (args: Seq[Expression]) => {
        // k must be a positive integer CONSTANT — any foldable expression
        // (bare literal, 1+7, CAST(8 AS INT)) is accepted, since function
        // resolution precedes constant folding; misuse surfaces as a clean
        // analysis-time error, not a raw NPE/ClassCastException from eval
        require(args.length == 2, s"kmv_kth expects 2 arguments, got ${args.length}")
        val k = args(1) match {
          case e if e.foldable && e.resolved =>
            e.eval() match {
              case v: Number if v.longValue() >= 1 && v.longValue() <= Int.MaxValue =>
                v.intValue()
              case other => throw new IllegalArgumentException(
                s"kmv_kth: k must be a positive integer constant, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"kmv_kth: k must be a positive integer constant expression, got $other")
        }
        KmvKthSmallest(args(0), k)
      }),
    ("segment_rows",
      new ExpressionInfo(classOf[SegmentRowsGenerator].getName, "segment_rows"),
      (args: Seq[Expression]) => SegmentRowsGenerator(args(0), args(1))))

  /** Register into an already-running session. Optimizer rules can't be
    * injected post-build through extensions, so the rewrite rides the
    * public `experimental.extraOptimizations` hook instead (idempotent). */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
    if (!spark.experimental.extraOptimizations.contains(CountToContains))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CountToContains
  }
}
