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
      (args: Seq[Expression]) => PyCountOccurrences(args(0), args(1))))

  /** Register into an already-running session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (name, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
