package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `graft_cosine_sim(a, b)` — native codegen cosine similarity between two
  * embedding columns (`array<float>` or `array<double>`).
  *
  * This is the pair-verification kernel of every LSH verify join (MinHash/
  * SRP candidate verification, the ANN recall gates) — the hottest
  * non-sketch path. Spark's higher-order-function formulation evaluates
  * lambdas interpretively per element (measured ~40x slower), and the
  * round-2 Scala UDF fixed that but still paid the encoder boundary
  * (UnsafeArrayData -> Array[Float] copy) per row. This expression reads
  * the UnsafeArrayData in place inside whole-stage codegen.
  *
  * Zero-norm vectors yield -1.0, never NaN: Spark orders NaN above every
  * double, so a NaN would rank first in top-k and pass >= thresholds.
  * Null elements count as 0.0. Lengths may differ; the common prefix is
  * used (mirrors the prior UDF's min-length semantics).
  */
case class CosineSimExpr(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine_sim"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two array<float>/array<double> columns, " +
          s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")
    }

  private lazy val leftIsFloat: Boolean = elemType(left).contains(FloatType)
  private lazy val rightIsFloat: Boolean = elemType(right).contains(FloatType)

  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    val lf = leftIsFloat
    val rf = rightIsFloat
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (a.isNullAt(i)) 0.0 else if (lf) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (b.isNullAt(i)) 0.0 else if (rf) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) -1.0 else dot / math.sqrt(na * nb)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val selfRef = ctx.addReferenceObj("cosineExpr", this, classOf[CosineSimExpr].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$selfRef.cosine($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {

  val CosineSimName = "graft_cosine_sim"

  private[plans] def cosineBuilder(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => CosineSimExpr(a, b)
    case _ => throw new IllegalArgumentException(s"$CosineSimName expects (a ARRAY, b ARRAY)")
  }

  def cosineSim(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.call_function(CosineSimName, a, b)
}
