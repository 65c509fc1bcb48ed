package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The dedup suite's word-3-gram shingle set as a native expression:
  * `graft_shingles(words)` → `array<string>` of DISTINCT
  * `"w1_w2_w3"` shingles in first-occurrence order.
  *
  * Exactly reproduces the declarative formulation in
  * [[graft.queries.DedupQueries.shinglesFromWords]] —
  * `array_distinct(transform(sequence(1, greatest(n-2, 1)), i ->
  * concat(get(i-1), '_', get(i), '_', get(i+1))))` — including the
  * <3-word edge: out-of-range `get` is null, concat null-propagates,
  * so a short doc yields the single-element array `[null]`. That
  * formulation runs as interpreted higher-order functions (a lambda
  * dispatch and a concat allocation per window position, then an
  * O(n²)-ish array_distinct); this is one tight JVM loop with a
  * LinkedHashSet, inside whole-stage codegen. DedupSpec pins the
  * equivalence on the real fixture.
  */
case class GraftShingles(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_shingles"

  override def nullSafeEval(words: Any): Any =
    GraftShingles.compute(words.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftShingles.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftShingles =
    copy(child = newChild)
}

object GraftShingles {
  private val Sep = UTF8String.fromString("_")

  /** Static entry for interpreted eval and codegen alike. */
  def compute(words: ArrayData): GenericArrayData = {
    val n = words.numElements()
    val m = math.max(n - 2, 1)
    val seen = new java.util.LinkedHashSet[Any](m * 2)
    var sawNull = false
    var nullFirstIdx = -1
    var i = 0
    while (i < m) {
      // window (i, i+1, i+2); any out-of-range or null word → null
      // shingle (concat's null propagation)
      if (i + 2 >= n || words.isNullAt(i) || words.isNullAt(i + 1) ||
          words.isNullAt(i + 2)) {
        if (!sawNull) { sawNull = true; nullFirstIdx = seen.size() }
      } else {
        seen.add(UTF8String.concat(
          words.getUTF8String(i), Sep, words.getUTF8String(i + 1), Sep,
          words.getUTF8String(i + 2)))
      }
      i += 1
    }
    // splice the single null back at its first-occurrence position
    // (nullFirstIdx = distinct non-null shingles seen before it),
    // matching array_distinct's first-occurrence order
    val out = new Array[Any](seen.size() + (if (sawNull) 1 else 0))
    val it = seen.iterator()
    var k = 0
    var emitted = 0
    while (k < out.length) {
      if (sawNull && emitted == nullFirstIdx) {
        out(k) = null
        sawNull = false
      } else {
        out(k) = it.next()
        emitted += 1
      }
      k += 1
    }
    new GenericArrayData(out)
  }
}
