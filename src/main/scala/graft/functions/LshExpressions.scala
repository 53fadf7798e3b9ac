package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native random-hyperplane LSH signatures.
  *
  * Computes the identical values to the declarative formulation in
  * graft.operators.Similarity (coeff(plane, dim) = pmod(xxhash64(plane,
  * dim), 1e5)/1e5 - 0.5 over int children, ordered double fold, bit p of
  * table t set iff dot(vec, plane_{t*nBits+p}) >= 0 — asserted in
  * LshExpressionsSpec), but in a tight JIT'd loop over a per-(shape)
  * memoized coefficient matrix instead of nTables x nBits x dim interpreted
  * expression evaluations per row.
  */
object LshKernel {
  private val Seed = 42L
  private val cache = new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Double]]]

  /** coeffs(plane)(dim): deterministic on every JVM — xxhash64 of the two
    * int literals exactly as the builtin xxhash64(plane, dim) folds them.
    * The memo is bounded: a corpus with ragged vector lengths would
    * otherwise retain one matrix per distinct dim for the JVM's lifetime
    * (values are pure functions of the key, so wholesale eviction is
    * harmless — the next caller recomputes). */
  def coeffs(nBits: Int, nTables: Int, dim: Int): Array[Array[Double]] = {
    if (cache.size > 64) cache.clear()
    cache.computeIfAbsent((nBits, nTables, dim), _ => {
      val nPlanes = nBits * nTables
      Array.tabulate(nPlanes, dim) { (plane, d) =>
        val h = XXH64.hashInt(d, XXH64.hashInt(plane, Seed))
        ((h % 100000L + 100000L) % 100000L).toDouble / 100000.0 - 0.5
      }
    })
  }

  /** nTables signatures of nBits bits each, float or double input vector.
    * A null element nulls every plane's dot product in the declarative
    * form, and `when(null >= 0, bit).otherwise(0)` zeroes every bit — so
    * the whole signature set collapses to 0L, replicated here. */
  def signatures(vec: ArrayData, nBits: Int, nTables: Int, isFloat: Boolean): Array[Long] = {
    val dim = vec.numElements()
    val v = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      if (vec.isNullAt(d)) return new Array[Long](nTables) // all-zero signatures
      v(d) = if (isFloat) vec.getFloat(d).toDouble else vec.getDouble(d)
      d += 1
    }
    val cs = coeffs(nBits, nTables, dim)
    val out = new Array[Long](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0L
      var p = 0
      while (p < nBits) {
        val c = cs(t * nBits + p)
        var dot = 0.0
        var i = 0
        while (i < dim) { dot += v(i) * c(i); i += 1 }
        if (dot >= 0) sig += (1L << p)
        p += 1
      }
      out(t) = sig
      t += 1
    }
    out
  }
}

object CosineKernel {
  /** cosine = dot(a,b) / (sqrt(dot(a,a)) * sqrt(dot(b,b))), every dot an
    * ordered double-precision left fold — bit-identical to the declarative
    * zip_with/aggregate formulation AND to DuckDB's list_dot_product over
    * DOUBLE[] (the oracle contract). Returns null (boxed) exactly where the
    * declarative form does: ragged lengths (zip_with pads with null) or a
    * null element — so a corrupt embedding row can never sneak a truncated
    * cosine past a >= threshold predicate. */
  def cosine(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}

case class CosineSim(left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true // ragged/null-element inputs yield null

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires two array<float|double> inputs, got $other")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineKernel.cosine(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val boxed = ctx.freshName("cos")
      s"""java.lang.Double $boxed = graft.functions.CosineKernel.cosine(
         |  $a, ${isFloat(left)}, $b, ${isFloat(right)});
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.doubleValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "cosine_sim"
}

case class HyperplaneSigs(child: Expression, nBits: Int, nTables: Int) extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs requires array<float|double>, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      LshKernel.signatures(input.asInstanceOf[ArrayData], nBits, nTables, isFloat))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.LshKernel.signatures($c, $nBits, $nTables, $isFloat))")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)
  override def prettyName: String = "hyperplane_sigs"
}

object LshFunctions {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def hyperplaneSigs(vec: Column, nBits: Int, nTables: Int): Column =
    ColumnBridge.column(HyperplaneSigs(ColumnBridge.expression(vec), nBits, nTables))
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSim(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
